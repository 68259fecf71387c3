"""Round-4 additions: endpoint-coverage guards on hits/kcore, the CLI
prepared-graph filter_ratio guard, prepared-table location verification,
near_dup_clusters id-type guard, the link-prediction wedge budget, and the
fused one-job-per-superstep k-core convergence loop."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


def edges_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


# --------------------------------------------------------------------------
# endpoint-coverage guards (ADVICE r3: hits/kcore lacked pagerank's guard)
# --------------------------------------------------------------------------

def test_hits_endpoint_guard_raises(spark):
    from pagerank_project_spark.operators.hits import hits

    e = edges_df(spark, [("a", "b"), ("b", "c")])
    verts = spark.createDataFrame([("a",), ("b",)], "id string")  # c missing
    with pytest.raises(ValueError, match="endpoint"):
        hits(spark, e, vertices=verts, iterations=2)
    # uncovered endpoints allowed only with an explicit opt-out
    res = hits(spark, e, vertices=verts, iterations=2, validate_vertices=False)
    assert res.scores.count() == 2


def test_kcore_endpoint_guard_raises(spark):
    from pagerank_project_spark.operators.kcore import kcore

    e = edges_df(spark, [("a", "b"), ("b", "c")])
    verts = spark.createDataFrame([("a",), ("b",)], "id string")
    with pytest.raises(ValueError, match="endpoint"):
        kcore(spark, e, vertices=verts)


# --------------------------------------------------------------------------
# CLI: --filter_ratio with --prepared_dir must error, not silently no-op
# --------------------------------------------------------------------------

def test_cli_prepared_with_filter_ratio_errors(spark, capsys):
    from pagerank_project_spark.cli import main

    rc = main(["--prepared_dir", "/nonexistent", "--filter_ratio", "0.3"])
    assert rc == 2
    assert "baked into the prepared graph" in capsys.readouterr().err


# --------------------------------------------------------------------------
# prepared graph: catalog entry is verified against the dir being loaded
# --------------------------------------------------------------------------

def test_load_prepared_moved_dir_reregisters(spark, tmp_path):
    """A prepared dir copied elsewhere carries a manifest naming the
    ORIGINAL path's catalog table; loading the copy while the original's
    table is registered must not serve the original's files."""
    from pagerank_project_spark.plans.prepared_graph import (
        _catalog_entry_matches,
        load_prepared,
        prepare_graph,
    )

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    pg_a = prepare_graph(spark, e, a_dir)  # registers table located at a/edges
    shutil.copytree(a_dir, b_dir)

    pg_b = load_prepared(spark, b_dir)
    import json

    tbl = json.load(open(f"{b_dir}/manifest.json"))["table"]
    assert _catalog_entry_matches(spark, tbl, b_dir, pg_b.buckets)
    assert pg_b.edges.count() == pg_a.m
    # and loading the original back re-points the entry at the original
    pg_a2 = load_prepared(spark, a_dir)
    assert _catalog_entry_matches(spark, tbl, a_dir, pg_a2.buckets)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


# --------------------------------------------------------------------------
# near_dup_clusters: non-integer ids must fail loudly, not NULL silently
# --------------------------------------------------------------------------

def test_near_dup_clusters_string_ids_raise(spark):
    from pagerank_project_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame([("doc-1", "doc-2")], "a string, b string")
    with pytest.raises(ValueError, match="integer ids"):
        near_dup_clusters(spark, pairs)


# --------------------------------------------------------------------------
# link prediction: wedge budget refuses uncapped hubs unless exact=True
# --------------------------------------------------------------------------

def _hub_edges(spark, n_leaves=40):
    return edges_df(spark, [("hub", f"l{i}") for i in range(n_leaves)])


def test_linkpred_wedge_budget_guard(spark):
    from pagerank_project_spark.operators.linkpred import link_prediction_topk

    e = _hub_edges(spark)
    with pytest.raises(ValueError, match="wedge_budget"):
        link_prediction_topk(spark, e, k=5, wedge_budget=100)
    # explicit opt-outs both run: exact quadratic, or a hub cap
    assert link_prediction_topk(spark, e, k=5, wedge_budget=100, exact=True).count() > 0
    assert link_prediction_topk(spark, e, k=5, wedge_budget=100, max_apex_degree=3).count() == 0


def test_linkpred_default_budget_unchanged_results(spark):
    """Under the budget the guard must not change the exact results."""
    from pagerank_project_spark.operators.linkpred import link_prediction_topk

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d")])
    got = link_prediction_topk(spark, e, k=10).collect()
    want = link_prediction_topk(spark, e, k=10, exact=True).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# --------------------------------------------------------------------------
# k-core convergence loop: ONE Spark job per h-index superstep
# --------------------------------------------------------------------------

def test_kcore_convergence_matches_networkx(spark):
    import networkx as nx

    from pagerank_project_spark.operators.kcore import kcore

    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
            ("e", "f"), ("f", "d"), ("a", "d"), ("g", "a")]
    res = kcore(spark, edges_df(spark, rows))
    got = {r["id"]: r["core"] for r in res.cores.collect()}
    assert res.converged
    assert got == nx.core_number(nx.Graph(rows))


def test_kcore_convergence_one_job_per_superstep(spark):
    """The fused loop (changed-count folded into the materializing agg) must
    cost exactly ONE Spark job per h-index superstep. Job counts outside the
    loop (AQE multi-job queries in setup/decode) are identical across runs,
    so two unconverged runs differing by one superstep must differ by one
    job."""
    from pagerank_project_spark.operators.kcore import kcore

    # a path graph's h-index fixpoint converges inward — 12 nodes need >3
    # supersteps, so both runs below stop on max_iterations, not convergence
    rows = [(f"v{i}", f"v{i + 1}") for i in range(12)]
    e = edges_df(spark, rows)
    sc = spark.sparkContext

    counts = {}
    for mi in (2, 3):
        grp = f"kcore-jobcount-{mi}"
        sc.setJobGroup(grp, "round-4 fused-loop assertion")
        try:
            res = kcore(spark, e, max_iterations=mi)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert not res.converged and res.iterations == mi
        counts[mi] = len(sc.statusTracker().getJobIdsForGroup(grp))

    assert counts[3] - counts[2] == 1
