"""Deterministic neighbor sampling (operators/neighbors.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pagerank_project_spark.operators.neighbors import khop_neighborhood, sample_adjacency

EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
    ("b", "c"), ("b", "d"),
    ("c", "a"),
    ("d", "e"), ("d", "a"), ("d", "b"),
    ("e", "e"),  # self-loop, must be dropped
    ("a", "b"),  # duplicate, must be deduped
]


def _replica_sample(edges, k, salt=""):
    adj = {}
    for s, d in set(edges):
        if s != d:
            adj.setdefault(s, set()).add(d)
    out = set()
    for s, ds in adj.items():
        key = lambda d: (hashlib.md5(f"{s}|{d}|{salt}".encode()).hexdigest(), d)
        for d in sorted(ds, key=key)[:k]:
            out.add((s, d))
    return out


def test_sample_adjacency_matches_python_replica(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    for k in (1, 2, 3, 10):
        got = {(r.src, r.dst) for r in sample_adjacency(df, k).collect()}
        assert got == _replica_sample(EDGES, k)


def test_sample_adjacency_partition_invariant_and_salted(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    base = {(r.src, r.dst) for r in sample_adjacency(df, 2).collect()}
    rep = {(r.src, r.dst) for r in sample_adjacency(df.repartition(7, "dst"), 2).collect()}
    assert base == rep
    salted = {(r.src, r.dst) for r in sample_adjacency(df, 2, salt="epoch1").collect()}
    assert salted == _replica_sample(EDGES, 2, salt="epoch1")
    # a's 4 neighbors make an identical 2-sample across salts unlikely;
    # assert against the replica (not inequality) so this can't flake
    assert salted != base or salted == _replica_sample(EDGES, 2, salt="epoch1")


def test_sample_adjacency_plan_has_partial_window_group_limit(spark):
    """The per-src top-K must compile to WindowGroupLimit with a Partial
    stage (≤K rows per src per map partition cross the exchange) — the
    property that makes a 10^7-degree hub ship K·partitions rows, not
    its whole adjacency."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    plan = sample_adjacency(df, 2)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_khop_neighborhood_replica(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {(r.root, r.hop, r.src, r.dst) for r in khop_neighborhood(df, seeds, [2, 2]).collect()}
    h1 = _replica_sample(EDGES, 2, salt="|h1")
    h2 = _replica_sample(EDGES, 2, salt="|h2")
    exp = {("a", 1, s, d) for (s, d) in h1 if s == "a"}
    frontier = {d for (_, _, _, d) in exp}
    exp |= {("a", 2, s, d) for (s, d) in h2 if s in frontier}
    assert got == exp
    hops = {r[1] for r in got}
    assert hops == {1, 2}


def test_khop_fanout_bounds_rows(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",)], "id string")
    rows = khop_neighborhood(df, seeds, [1, 1]).collect()
    # per root: ≤1 hop-1 edge and ≤1 hop-2 edge
    assert len(rows) <= 2 * 2
    for r in rows:
        assert r.src != r.dst
