"""Strategy equivalence: relational superstep ≡ CSR pandas-UDF superstep
≡ numpy oracle; salting on/off produces identical scores (SURVEY.md §5.3
invariant 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import oracle_numpy as oracle
from pagerank_project_spark.config import PageRankConfig
from pagerank_project_spark.operators.extract import extract_edges, vertices_from_files
from pagerank_project_spark.operators.pagerank import pagerank


def ranks_map(res):
    return {r["id"]: r["rank"] for r in res.ranks.collect()}


def test_csr_equals_relational_small(spark, small_rows):
    edges = spark.createDataFrame(pd.DataFrame(small_rows, columns=["src", "dst"]))
    rel = ranks_map(pagerank(spark, edges, cfg=PageRankConfig(mode="reference", epsilon=1e-8, strategy="relational")))
    csr = ranks_map(pagerank(spark, edges, cfg=PageRankConfig(mode="reference", epsilon=1e-8, strategy="csr")))
    assert set(rel) == set(csr)
    for k in rel:
        assert csr[k] == pytest.approx(rel[k], abs=1e-9)


def test_csr_with_salting_on_synthetic_hub(spark, sf0001_fixture):
    """The fixture hub entry file has out-degree ~100 and in-degree ~30% of
    cross-repo refs; force aggressive salting (threshold 8, 4 buckets) and
    require exact equivalence with the oracle."""
    files = spark.read.parquet(f"{sf0001_fixture}/source_table/data")
    edges = extract_edges(files, verify_sha=False).persist()
    verts = vertices_from_files(files)

    vkeys = sorted(r["id"] for r in verts.distinct().collect())
    idx = {k: i for i, k in enumerate(vkeys)}
    epd = edges.select("src", "dst").toPandas()
    src = np.array([idx[s] for s in epd["src"]])
    dst = np.array([idx[t] for t in epd["dst"]])
    w = oracle.sparse_weights(src)
    x, _ = oracle.power_method_sparse(len(vkeys), src, dst, w, epsilon=1e-8, max_iterations=200)

    cfg = PageRankConfig(
        mode="reference", epsilon=1e-8, max_iterations=200,
        strategy="csr", salt_buckets=4, hub_degree_threshold=8,
    )
    got = ranks_map(pagerank(spark, edges, vertices=verts, cfg=cfg))
    for k, i in idx.items():
        assert got[k] == pytest.approx(x[i], abs=1e-6)

    # salting off → identical scores (invariance)
    cfg_off = PageRankConfig(
        mode="reference", epsilon=1e-8, max_iterations=200,
        strategy="csr", salt_buckets=1, hub_degree_threshold=10**9,
    )
    off = ranks_map(pagerank(spark, edges, vertices=verts, cfg=cfg_off))
    for k in off:
        assert got[k] == pytest.approx(off[k], abs=1e-9)
    edges.unpersist()
