"""Device-plane LIKE matching vs the host regex oracle.

The device path (ops/strings.py) handles plain `seg%seg%...` patterns over
packed dictionary byte planes; every result must be bit-identical to the
regex evaluation the engine uses as its general path (itself
differential-tested against the reference binary in test_functions.py).
"""

import re

import numpy as np
import pytest

from duckdb_tpu.ops.strings import device_like_lut, split_plain_pattern
from duckdb_tpu.planner.bound import like_to_regex


def _oracle(dvals, pattern, ci):
    prog = re.compile(like_to_regex(pattern), re.IGNORECASE if ci else 0)
    return np.fromiter((prog.match(s) is not None for s in dvals),
                       dtype=np.bool_, count=len(dvals))


WORDS = ["special", "requests", "regular", "deposits", "theodolites",
         "foxes", "pending", "", "x", "ab", "final", "accounts"]


@pytest.fixture(scope="module")
def dvals():
    rng = np.random.default_rng(42)
    vals = set()
    for _ in range(6000):
        k = rng.integers(1, 5)
        vals.add(" ".join(rng.choice(WORDS[:7], k)))
    # adversarial edge strings
    vals |= {"", "%", "special", "specialrequests", "special requests",
             "srequests special", "SPECIAL Requests", "sspecial",
             "requestss", "special" * 10, "a" * 120}
    return np.array(sorted(vals), dtype=object)


PATTERNS = [
    "%special%requests%",
    "%special%",
    "special%",
    "%requests",
    "special",
    "%",
    "%%",
    "special%requests",
    "%es%es%es%",
    "s%s",
    "",
    "%special requests%",
    "%x%",
    # single-char wildcards and escapes (device-tokenized since round 3)
    "sp_cial%",
    "%requ_sts",
    "_______",
    "%s_e%",
    "s_%_l",
    "__",
    "%\\%%",
    "special\\%requests",
    "%e_",
]


@pytest.mark.parametrize("pattern", PATTERNS)
@pytest.mark.parametrize("ci", [False, True])
def test_device_like_matches_regex(dvals, pattern, ci):
    got = device_like_lut(dvals, pattern, ci)
    assert got is not None, "plain pattern must take the device path"
    want = _oracle(dvals, pattern if not ci else pattern, ci)
    mism = np.nonzero(got != want)[0]
    assert len(mism) == 0, [(dvals[i], bool(got[i]), bool(want[i]))
                            for i in mism[:5]]


def test_non_plain_patterns():
    d = np.array(["abc", "adc", "a%c", "axxc"], dtype=object)
    # the strict literal-segment splitter still rejects these (fused path)
    assert split_plain_pattern("a_c", False) is None
    assert split_plain_pattern("a\\%c", False) is None
    assert split_plain_pattern("añ%", False) is None
    # but the tokenized device matcher handles _ and escapes
    assert list(device_like_lut(d, "a_c", False)) == [True, True, True, False]
    assert list(device_like_lut(d, "a\\%c", False)) == [False, False, True,
                                                        False]
    # non-ASCII still falls back to host
    assert device_like_lut(d, "añ%", False) is None


def test_non_ascii_dict_falls_back():
    d = np.array(["héllo", "world"], dtype=object)
    assert device_like_lut(d, "w%", False) is None


def test_engine_q13_shape():
    """Q13-class: LIKE over a near-unique column must agree with the regex
    path end-to-end through SQL (force both paths via threshold)."""
    import duckdb_tpu
    from duckdb_tpu.ops import strings as S

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE c AS SELECT range AS id,"
            " 'note ' || CAST(range AS VARCHAR) ||"
            " CASE WHEN range % 7 = 0 THEN ' special requests'"
            "      WHEN range % 11 = 0 THEN ' special deposits requests'"
            "      ELSE ' regular' END AS comment"
            " FROM range(9000)")
    q = ("SELECT count(*) FROM c WHERE comment NOT LIKE"
         " '%special%requests%'")
    old = S.DEVICE_LIKE_MIN_DICT
    try:
        S.DEVICE_LIKE_MIN_DICT = 10**9  # host path
        want = con.sql(q).fetchall()
        con._plan_cache.clear()
        S.DEVICE_LIKE_MIN_DICT = 1      # device path
        got = con.sql(q).fetchall()
    finally:
        S.DEVICE_LIKE_MIN_DICT = old
    assert got == want
    expected = sum(1 for i in range(9000)
                   if not (i % 7 == 0 or i % 11 == 0))
    assert got == [(expected,)]


# ---------------------------------------------------------------------------
# device plane transforms / predicates vs the Python oracle


@pytest.fixture(scope="module")
def tvals():
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcXYZ 019_%\\.,"))
    vals = {"", " ", "  x  ", "%", "_", "\\", "a" * 90, " lead", "trail "}
    for _ in range(600):
        k = int(rng.integers(0, 24))
        vals.add("".join(rng.choice(alpha, k)))
    return np.array(sorted(vals), dtype=object)


def _plane(dvals):
    from duckdb_tpu.ops import strings as S

    packed = S._pack_dict(dvals)
    assert packed is not None
    return packed


def _decode(plane2, lens2, dvals_len):
    from duckdb_tpu.ops import strings as S

    remap, uniq = S._decode_plane(plane2, lens2)
    assert len(remap) == dvals_len
    return [str(uniq[c]) for c in remap]


def _host_pad(s, n, p, left):
    from duckdb_tpu.planner.functions_ext import _host_pad as hp

    return hp(s, n, p, left)


TRANSFORM_CASES = [
    ("upper", lambda S, p, l: S.op_case(p, l, True), str.upper),
    ("lower", lambda S, p, l: S.op_case(p, l, False), str.lower),
    ("initcap", lambda S, p, l: S.op_initcap(p, l),
     lambda s: s[:1].upper() + s[1:].lower()),
    ("reverse", lambda S, p, l: S.op_reverse(p, l), lambda s: s[::-1]),
    ("substr_2_5", lambda S, p, l: S.op_substring(p, l, 1, 5),
     lambda s: s[1:6]),
    ("substr_4_", lambda S, p, l: S.op_substring(p, l, 3, None),
     lambda s: s[3:]),
    ("left3", lambda S, p, l: S.op_left(p, l, 3), lambda s: s[:3]),
    ("left_m2", lambda S, p, l: S.op_left(p, l, -2),
     lambda s: s[:max(len(s) - 2, 0)]),
    ("right3", lambda S, p, l: S.op_right(p, l, 3),
     lambda s: s[-3:] if len(s) >= 3 else s),
    ("right_m2", lambda S, p, l: S.op_right(p, l, -2), lambda s: s[2:]),
    ("trim", lambda S, p, l: S.op_trim(p, l, b" ", True, True), str.strip),
    ("ltrim", lambda S, p, l: S.op_trim(p, l, b" ", True, False),
     str.lstrip),
    ("rtrim", lambda S, p, l: S.op_trim(p, l, b" a", False, True),
     lambda s: s.rstrip(" a")),
    ("lpad8", lambda S, p, l: S.op_pad(p, l, 8, "xy", True),
     lambda s: _host_pad(s, 8, "xy", True)),
    ("rpad8", lambda S, p, l: S.op_pad(p, l, 8, "-", False),
     lambda s: _host_pad(s, 8, "-", False)),
    ("repeat2", lambda S, p, l: S.op_repeat(p, l, 2), lambda s: s * 2),
    ("concat_c", lambda S, p, l: S.op_concat_const(p, l, ">>", "<."),
     lambda s: ">>" + s + "<."),
]


@pytest.mark.parametrize("name,dev,host", TRANSFORM_CASES,
                         ids=[c[0] for c in TRANSFORM_CASES])
def test_plane_transforms(tvals, name, dev, host):
    from duckdb_tpu.ops import strings as S

    plane, lens = _plane(tvals)
    got = _decode(*dev(S, plane, lens), len(tvals))
    want = [host(str(s)) for s in tvals]
    bad = [(s, g, w) for s, g, w in zip(tvals, got, want) if g != w]
    assert not bad, bad[:5]


VALUE_CASES = [
    ("contains_a", lambda S, p, l: S.op_contains(p, l, "a"),
     lambda s: "a" in s),
    ("contains_xy", lambda S, p, l: S.op_contains(p, l, "Xc"),
     lambda s: "Xc" in s),
    ("prefix", lambda S, p, l: S.op_prefix(p, l, "ab"),
     lambda s: s.startswith("ab")),
    ("suffix", lambda S, p, l: S.op_suffix(p, l, "c,"),
     lambda s: s.endswith("c,")),
    ("strpos", lambda S, p, l: S.op_strpos(p, l, "c"),
     lambda s: s.find("c") + 1),
    ("ascii", lambda S, p, l: S.op_ascii(p, l),
     lambda s: ord(s[0]) if s else 0),
]


@pytest.mark.parametrize("name,dev,host", VALUE_CASES,
                         ids=[c[0] for c in VALUE_CASES])
def test_plane_values(tvals, name, dev, host):
    from duckdb_tpu.ops import strings as S

    plane, lens = _plane(tvals)
    got = np.asarray(dev(S, plane, lens))
    want = np.array([host(str(s)) for s in tvals])
    bad = [(s, g, w) for s, g, w in zip(tvals, got, want) if g != w]
    assert not bad, bad[:5]


def test_sql_device_transforms_match_host():
    """End-to-end: force the device plane path and compare against the
    host per-distinct loop through real SQL."""
    import duckdb_tpu
    from duckdb_tpu.ops import strings as S

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE t AS SELECT 'v' || CAST(range AS VARCHAR) ||"
            " CASE WHEN range % 3 = 0 THEN ' Abc ' ELSE 'xY' END AS s,"
            " range AS i FROM range(5000)")
    queries = [
        "SELECT sum(length(s)), min(upper(s)), max(lower(s)) FROM t",
        "SELECT min(substring(s, 2, 4)), max(reverse(s)) FROM t",
        "SELECT min(trim(s)), max(rtrim(s)), min(ltrim(s)) FROM t",
        "SELECT count(*) FROM t WHERE contains(s, '7x')",
        "SELECT count(*) FROM t WHERE starts_with(s, 'v1')",
        "SELECT count(*) FROM t WHERE ends_with(s, 'Abc ')",
        "SELECT sum(strpos(s, 'xY')), sum(ascii(s)) FROM t",
        "SELECT min(lpad(s, 12, '*')), max(rpad(s, 12, '#')) FROM t",
        "SELECT min(left(s, 4)), max(right(s, 4)) FROM t",
        "SELECT min(s || '!tail'), max('head!' || s) FROM t",
        "SELECT count(*) FROM t WHERE s LIKE 'v_7%'",
        "SELECT count(*) FROM t WHERE s ILIKE '%aBC%'",
    ]
    old = (S.DEVICE_STR_MIN_DICT, S.DEVICE_LIKE_MIN_DICT)
    try:
        S.DEVICE_STR_MIN_DICT = S.DEVICE_LIKE_MIN_DICT = 10**9
        want = [con.sql(q).fetchall() for q in queries]
        con._plan_cache.clear()
        S.DEVICE_STR_MIN_DICT = S.DEVICE_LIKE_MIN_DICT = 1
        got = [con.sql(q).fetchall() for q in queries]
    finally:
        S.DEVICE_STR_MIN_DICT, S.DEVICE_LIKE_MIN_DICT = old
    for q, g, w in zip(queries, got, want):
        assert g == w, (q, g, w)


def test_host_loop_observability():
    """Large-dict host loops must be recorded (the device path's absence
    is observable); the device path must record nothing."""
    import duckdb_tpu
    from duckdb_tpu.ops import strings as S

    con = duckdb_tpu.connect()
    con.sql("CREATE TABLE big AS SELECT 'x' || CAST(range AS VARCHAR)"
            " AS s FROM range(5000)")
    S.host_loop_events.clear()
    con.sql("SELECT count(*) FROM big WHERE s LIKE '%42%'")
    assert S.host_loop_events == []  # device path, no host loop
    con._plan_cache.clear()
    S.host_loop_events.clear()
    con.sql("SELECT min(md5(s)) FROM big")  # md5 has no device op
    assert any(n.startswith("md5") for n, _ in S.host_loop_events)
