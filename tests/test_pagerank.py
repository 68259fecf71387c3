"""PageRank parity vs the numpy oracle (FIXTURES.md §F1/§F2).

Acceptance (BASELINE.json north_rule): per-vertex scores allclose 1e-6
against the float64 replica of reference pagerank.py:100-139, in every
normalization mode; golden-table drift alarms from FIXTURES.md §F1."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pagerank_project_spark.config import PageRankConfig
from pagerank_project_spark.functions.query import url_satisfies_query
from pagerank_project_spark.operators.extract import extract_edges, vertices_from_files
from pagerank_project_spark.operators.pagerank import pagerank

import oracle_numpy as oracle

F1_GOLDEN = {  # FIXTURES.md §F1 (float64, converged 1e-12)
    "reference": {"1": 0.09939465, "2": 0.13005725, "3": 0.10787204, "4": 0.26598602, "5": 0.18144961, "6": 0.21524043},
    "l2l2": {"1": 0.16916731, "2": 0.23175380, "3": 0.18590195, "4": 0.66269884, "5": 0.41434469, "6": 0.52178712},
    "standard": {"1": 0.05170475, "2": 0.07367926, "3": 0.05741241, "4": 0.34870369, "5": 0.19990381, "6": 0.26859608},
    "l2l1": {"1": 0.06149419, "2": 0.08961390, "3": 0.06867757, "4": 0.72456810, "5": 0.39282053, "6": 0.55151093},
}


def edges_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))


def ranks_map(res) -> dict[str, float]:
    return {r["id"]: r["rank"] for r in res.ranks.collect()}


def oracle_map(rows, **kw) -> tuple[dict[str, float], int]:
    urls, x, iters = oracle.pagerank_from_rows(rows, **kw)
    return dict(zip(urls, x)), iters


@pytest.mark.parametrize("mode", ["reference", "l2l2", "standard", "l2l1"])
def test_small_graph_all_modes(spark, small_rows, mode):
    cfg = PageRankConfig(mode=mode, epsilon=1e-8, max_iterations=400)
    res = pagerank(spark, edges_df(spark, small_rows), cfg=cfg)
    got = ranks_map(res)
    exp, _ = oracle_map(small_rows, epsilon=1e-8, max_iterations=400, norm_x=cfg.norm_x, norm_v=cfg.norm_v)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6)
    # golden drift alarm (FIXTURES.md §F1)
    for k, v in F1_GOLDEN[mode].items():
        assert got[k] == pytest.approx(v, abs=1e-6)
    # ranking order pin (README.md:137-142): 4 > 6 > 5 > 2 > 3 > 1
    order = sorted(got, key=got.get, reverse=True)
    assert order == ["4", "6", "5", "2", "3", "1"]


def test_small_graph_iteration_count_matches_reference(spark, small_rows):
    """Committed-code semantics converge at 17 iterations, ε=1e-6 (SURVEY §5.2)."""
    res = pagerank(spark, edges_df(spark, small_rows), cfg=PageRankConfig(mode="reference"))
    _, iters = oracle_map(small_rows, norm_x="l1", norm_v="l2")
    assert res.iterations == iters == 17
    assert res.converged


def test_alpha_variants(spark, small_rows):
    # fixed-K parity: both engine and oracle run exactly K supersteps, so
    # the comparison is exact even for alpha=0.99999 (which converges only
    # after ~10^6 iterations; the reference README's 686-iteration run used
    # filter_ratio=0.2, README.md:631-1316)
    for alpha in (0.5, 0.99999):
        cfg = PageRankConfig(alpha=alpha, mode="standard", epsilon=1e-300, max_iterations=25)
        res = pagerank(spark, edges_df(spark, small_rows), cfg=cfg)
        exp, _ = oracle_map(small_rows, alpha=alpha, epsilon=1e-300, max_iterations=25, norm_x="l1", norm_v="l1")
        got = ranks_map(res)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], abs=1e-6)


def test_filter_ratio(spark, small_rows):
    """In-link-ratio spam filter (pagerank.py:42-47) incl. the n-definition
    subtlety; vertex set unchanged."""
    cfg = PageRankConfig(filter_ratio=0.4, mode="reference", epsilon=1e-8)
    res = pagerank(spark, edges_df(spark, small_rows), cfg=cfg)
    exp, _ = oracle_map(small_rows, filter_ratio=0.4, epsilon=1e-8, norm_x="l1", norm_v="l2")
    got = ranks_map(res)
    assert set(got) == set(exp)  # filtered nodes stay as vertices
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6)


def test_personalization(spark, small_rows):
    from pyspark.sql import functions as F

    cfg = PageRankConfig(mode="reference", epsilon=1e-8)
    v_expr = url_satisfies_query(F.col("id"), "4")
    res = pagerank(spark, edges_df(spark, small_rows), cfg=cfg, v_expr=v_expr)
    exp, _ = oracle_map(small_rows, epsilon=1e-8, norm_x="l1", norm_v="l2", matcher=lambda u: "4" in u)
    got = ranks_map(res)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6)


def test_edge_order_permutation_invariance(spark, small_rows):
    """Shuffled edge input → identical scores (reference relies on sorted
    input, pagerank.py:50-61; our groupBy semantics must not)."""
    import random

    rows = list(small_rows)
    random.Random(7).shuffle(rows)
    cfg = PageRankConfig(mode="reference", epsilon=1e-8)
    a = ranks_map(pagerank(spark, edges_df(spark, small_rows), cfg=cfg))
    b = ranks_map(pagerank(spark, edges_df(spark, rows), cfg=cfg))
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_synthetic_sf0001_uniform_and_modes(spark, sf0001_fixture):
    """End-to-end on the source-code table: extract → pagerank vs sparse
    oracle over the full vertex universe (isolated files included)."""
    files = spark.read.parquet(f"{sf0001_fixture}/source_table/data")
    edges = extract_edges(files).persist()
    verts = vertices_from_files(files)

    vkeys = sorted(r["id"] for r in verts.distinct().collect())
    idx = {k: i for i, k in enumerate(vkeys)}
    epd = edges.select("src", "dst").toPandas()
    src = np.array([idx[s] for s in epd["src"]])
    dst = np.array([idx[t] for t in epd["dst"]])
    w = oracle.sparse_weights(src)

    for mode, (nx_, nv_) in [("reference", ("l1", "l2")), ("standard", ("l1", "l1"))]:
        cfg = PageRankConfig(mode=mode, epsilon=1e-8, max_iterations=300)
        res = pagerank(spark, edges, vertices=verts, cfg=cfg)
        got = ranks_map(res)
        x, _ = oracle.power_method_sparse(
            len(vkeys), src, dst, w, epsilon=1e-8, max_iterations=300, norm_x=nx_, norm_v=nv_
        )
        assert len(got) == len(vkeys)
        for k, i in idx.items():
            assert got[k] == pytest.approx(x[i], abs=1e-6), (mode, k)
    edges.unpersist()


def test_checkpoint_resume(spark, small_rows, tmp_path):
    """Resume at iteration k ≡ uninterrupted run (BASELINE.json north_rule)."""
    from pagerank_project_spark.plans.checkpoint import CheckpointStore

    full = ranks_map(
        pagerank(spark, edges_df(spark, small_rows), cfg=PageRankConfig(mode="reference", epsilon=1e-8))
    )
    store = CheckpointStore(str(tmp_path), "pr")
    cfg_a = PageRankConfig(mode="reference", epsilon=1e-8, max_iterations=5)
    pagerank(spark, edges_df(spark, small_rows), cfg=cfg_a, checkpoint_store=store)
    assert store.latest_iteration() == 4
    mets = store.metrics()
    assert all({"residual_l2", "l1_delta", "active_vertices"} <= set(m) for m in mets.values())

    cfg_b = PageRankConfig(mode="reference", epsilon=1e-8, max_iterations=1000)
    res_b = pagerank(spark, edges_df(spark, small_rows), cfg=cfg_b, checkpoint_store=store)
    resumed = ranks_map(res_b)
    for k in full:
        assert resumed[k] == pytest.approx(full[k], abs=1e-9)
