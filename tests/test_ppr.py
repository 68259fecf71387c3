"""Batched multi-seed personalized PageRank (operators/ppr.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_project_spark.operators.ppr import ppr_batch, ppr_topk

EDGES = [
    ("a", "b"), ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "a"), ("d", "c"),
    # "e" dangling (no out-edges), reachable from nothing; seed it to test
    # the dangling-mass-to-seed rule directly
    ("b", "e"),
]
IDS = ["a", "b", "c", "d", "e"]


def _replica(seeds, alpha, iters):
    idx = {v: i for i, v in enumerate(IDS)}
    n = len(IDS)
    P = np.zeros((n, n))
    for s, d in EDGES:
        P[idx[s], idx[d]] = 1.0
    outd = P.sum(axis=1)
    for i in range(n):
        if outd[i] > 0:
            P[i] /= outd[i]
    out = {}
    for s in seeds:
        e = np.zeros(n)
        e[idx[s]] = 1.0
        r = e.copy()
        for _ in range(iters):
            dang = r[outd == 0].sum()
            r = alpha * (P.T @ r + dang * e) + (1 - alpha) * e
        out[s] = {IDS[i]: r[i] for i in range(n) if r[i] > 0}
    return out


@pytest.mark.parametrize("iters", [1, 4])
def test_ppr_batch_matches_numpy_replica(spark, iters):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",), ("e",)], "id string")
    got = {}
    for r in ppr_batch(spark, df, seeds, alpha=0.85, iterations=iters).collect():
        got.setdefault(r.seed, {})[r.id] = r.rank
    exp = _replica(["a", "d", "e"], 0.85, iters)
    assert set(got) == set(exp)
    for s in exp:
        assert set(got[s]) == set(exp[s])
        for v in exp[s]:
            assert got[s][v] == pytest.approx(exp[s][v], abs=1e-12)


def test_ppr_vectors_are_probability_distributions(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([(v,) for v in IDS], "id string")
    sums = (
        ppr_batch(spark, df, seeds, iterations=3)
        .groupBy("seed")
        .sum("rank")
        .collect()
    )
    assert len(sums) == 5
    for r in sums:
        assert r["sum(rank)"] == pytest.approx(1.0, abs=1e-12)


def test_ppr_support_is_sparse(spark):
    """Seed 'e' is dangling: its walk restarts at e forever, so the
    support stays {e} — the sparse-state formulation must not materialize
    zero rows for the rest of the graph."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("e",)], "id string")
    rows = ppr_batch(spark, df, seeds, iterations=5).collect()
    assert {(r.seed, r.id) for r in rows} == {("e", "e")}
    assert rows[0].rank == pytest.approx(1.0, abs=1e-15)


def test_ppr_topk_plan_and_order(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",)], "id string")
    out = ppr_topk(spark, df, seeds, k=2, iterations=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    rows = out.collect()
    exp = _replica(["a", "d"], 0.85, 3)
    for r in rows:
        assert r.rank == pytest.approx(round(exp[r.seed][r.id], 6), abs=1e-9)
    per_seed = {}
    for r in rows:
        per_seed.setdefault(r.seed, []).append(r.rnk)
    for s, rnks in per_seed.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 2


def test_ppr_seed_keeps_restart_mass(spark):
    """The restart term guarantees rank(seed) >= 1 - alpha regardless of
    graph shape — the invariant that makes PPR a 'from the seed's point
    of view' score."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    for s in IDS:
        seeds = spark.createDataFrame([(s,)], "id string")
        rows = {r.id: r.rank for r in ppr_batch(spark, df, seeds, iterations=4).collect()}
        assert rows[s] >= 0.15 - 1e-12


def test_ppr_prune_below_bounds_support_and_error(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",)], "id string")
    exact = {
        (r.seed, r.id): r.rank for r in ppr_batch(spark, df, seeds, iterations=4).collect()
    }
    pruned = {
        (r.seed, r.id): r.rank
        for r in ppr_batch(spark, df, seeds, iterations=4, prune_below=0.02).collect()
    }
    assert set(pruned) <= set(exact)
    assert all(v >= 0.02 for v in pruned.values())
    # surviving entries stay close to exact (dropped mass is small)
    for k, v in pruned.items():
        assert abs(v - exact[k]) < 4 * 0.02
    # prune_below=0 is the exact iteration
    zero = {
        (r.seed, r.id): r.rank
        for r in ppr_batch(spark, df, seeds, iterations=4, prune_below=0.0).collect()
    }
    assert zero == exact


def test_ppr_cone_pruning_is_bitwise_exact(spark):
    """The (iterations-1)-hop out-cone is exactly what any superstep can
    read, so pruned and unpruned runs must agree bitwise — including the
    dangling test (all out-edges of cone members are kept)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    for seed_set in (["a"], ["e"], ["a", "d", "e"]):
        seeds = spark.createDataFrame([(s,) for s in seed_set], "id string")
        for iters in (1, 3):
            on = {(r.seed, r.id, r.rank)
                  for r in ppr_batch(spark, df, seeds, iterations=iters, cone=True).collect()}
            off = {(r.seed, r.id, r.rank)
                   for r in ppr_batch(spark, df, seeds, iterations=iters, cone=False).collect()}
            assert on == off
