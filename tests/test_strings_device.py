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


def test_non_plain_patterns_fall_back():
    d = np.array(["abc", "adc"], dtype=object)
    assert split_plain_pattern("a_c", False) is None
    assert split_plain_pattern("a\\%c", False) is None
    assert split_plain_pattern("añ%", False) is None
    assert device_like_lut(d, "a_c", False) is None


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
