"""Bucket dense join: direct-address on a packed-key prefix with duplicate
buckets (the TPU analog of the reference's radix-partitioned hash table,
/root/reference/src/execution/radix_partitioned_hashtable.cpp). Asserts the
bucket path is actually taken (not a silently-passing fallback) and checks
results against a plain-Python oracle."""

import random

import pytest

import duckdb_tpu
from duckdb_tpu.execution import executor as X


@pytest.fixture()
def traced_paths(monkeypatch):
    # pin the round-3 dense cap so the 20M-pair-key fixtures still route
    # to the bucket path (production cap is now 2^27 for HBM-scale LUTs)
    monkeypatch.setattr(X.Executor, "DENSE_JOIN_LIMIT", 1 << 24)
    from duckdb_tpu.execution import fused_agg as FA
    monkeypatch.setattr(FA, "DENSE_LUT_LIMIT", 1 << 24)
    # this file pins the EAGER join paths; the fused aggregate pipeline
    # (which now also covers semi/anti probes) would pre-empt them
    monkeypatch.setattr(FA, "build_fused_agg", lambda ex, node: None)
    calls = {"bucket": 0, "sorted": 0, "dense": 0}
    ob, os_, od = (X.Executor._bucket_join, X.Executor._sorted_join,
                   X.Executor._dense_join)

    def wb(self, *a, **k):
        r = ob(self, *a, **k)
        calls["bucket"] += r is not None
        return r

    def ws(self, *a, **k):
        calls["sorted"] += 1
        return os_(self, *a, **k)

    def wd(self, *a, **k):
        r = od(self, *a, **k)
        calls["dense"] += r is not None
        return r

    monkeypatch.setattr(X.Executor, "_bucket_join", wb)
    monkeypatch.setattr(X.Executor, "_sorted_join", ws)
    monkeypatch.setattr(X.Executor, "_dense_join", wd)
    return calls


@pytest.fixture()
def con():
    c = duckdb_tpu.connect()
    random.seed(11)
    n_part, n_supp = 5000, 4000  # combined domain 20M pair keys > 2^24
    pairs = [(p, (p * 7 + s) % n_supp + 1)
             for p in range(1, n_part + 1) for s in range(4)]
    c.sql("CREATE TABLE ps(pk INTEGER, sk INTEGER, cost DOUBLE)")
    a = c.appender("ps")
    a.append_rows([(p, s, (p * 31 + s) % 997) for p, s in pairs])
    a.close()
    rows = []
    for i in range(8000):
        p = random.randint(1, n_part)
        rows.append((p, (p * 7 + random.randint(0, 5)) % n_supp + 1, i % 50))
    c.sql("CREATE TABLE li(pk INTEGER, sk INTEGER, qty INTEGER)")
    a = c.appender("li")
    a.append_rows(rows)
    a.close()
    c._ps, c._li = pairs, rows
    return c


def _oracle(pairs, rows):
    cost = {(p, s): (p * 31 + s) % 997 for p, s in pairs}
    return cost


def test_two_key_inner_keeps_probe_shape(con, traced_paths):
    got = con.sql("SELECT count(*), sum(ps.cost * li.qty) FROM li "
                  "JOIN ps ON ps.pk = li.pk AND ps.sk = li.sk").rows()
    cost = _oracle(con._ps, con._li)
    match = [(p, s, q) for p, s, q in con._li if (p, s) in cost]
    assert got == [(len(match), sum(cost[p, s] * q for p, s, q in match))]
    assert traced_paths["bucket"] == 1 and traced_paths["sorted"] == 0


def test_two_key_anti(con, traced_paths):
    got = con.sql("SELECT count(*) FROM li WHERE NOT EXISTS "
                  "(SELECT 1 FROM ps WHERE ps.pk = li.pk AND ps.sk = li.sk)"
                  ).rows()
    cost = _oracle(con._ps, con._li)
    assert got == [(sum((p, s) not in cost for p, s, _ in con._li),)]
    assert traced_paths["bucket"] == 1


def test_duplicate_build_left_join(con, traced_paths):
    # single-key join, 4 build rows per key → expansion through the
    # bucket match matrix
    got = con.sql("SELECT count(*), sum(ps.cost) FROM li "
                  "LEFT JOIN ps ON ps.pk = li.pk").rows()
    per_pk = {}
    for p, s in con._ps:
        per_pk.setdefault(p, []).append((p * 31 + s) % 997)
    n = sum(max(len(per_pk.get(p, [])), 1) for p, _, _ in con._li)
    tot = sum(sum(per_pk.get(p, [])) for p, _, _ in con._li)
    assert got == [(n, tot)]
    assert traced_paths["bucket"] == 1 and traced_paths["sorted"] == 0


def test_duplicate_build_inner_expansion(con, traced_paths):
    got = con.sql("SELECT count(*) FROM li JOIN ps ON ps.pk = li.pk").rows()
    per_pk = {}
    for p, _ in con._ps:
        per_pk[p] = per_pk.get(p, 0) + 1
    assert got == [(sum(per_pk.get(p, 0) for p, _, _ in con._li),)]
    assert traced_paths["bucket"] == 1


def test_hot_bucket_falls_back_to_sorted(con, traced_paths):
    # one build key duplicated 5000× — exceeds the bucket width cap
    con.sql("CREATE TABLE hot(k INTEGER, v INTEGER)")
    a = con.appender("hot")
    a.append_rows([(42, i) for i in range(5000)] + [(7, 1)])
    a.close()
    got = con.sql("SELECT count(*) FROM li JOIN hot ON hot.k = li.qty").rows()
    n42 = sum(q == 42 for _, _, q in con._li)
    n7 = sum(q == 7 for _, _, q in con._li)
    assert got == [(n42 * 5000 + n7,)]
    assert traced_paths["sorted"] == 1
