"""Ingest-order parity with the reference (SURVEY.md §3.2): max_nnz raw-row
cap, URL regex filter (a dropped row never registers vertices), and CC
checkpoint-resume."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

import oracle_numpy as oracle
from pagerank_project_spark.config import PageRankConfig
from pagerank_project_spark.operators.pagerank import pagerank
from pagerank_project_spark.sources.csv_edgelist import read_edgelist_csv


@pytest.fixture()
def url_csv(tmp_path):
    """Edge list with URL-shaped nodes; some match the drop regex
    .*((/$)|(/.*/)).* (trailing slash or interior /…/ segment)."""
    rows = [
        ("a.com/x", "a.com/y"),
        ("a.com/x", "b.com/covid/"),      # dst trailing slash → dropped
        ("a.com/deep/page", "a.com/y"),   # src interior // → dropped
        ("b.com/z", "a.com/x"),
        ("a.com/y", "b.com/z"),
        ("a.com/y", "a.com/x"),
    ]
    p = tmp_path / "urls.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("source,target\n")
        for s, t in rows:
            f.write(f"{s},{t}\n")
    return str(p), rows


def test_url_filter_parity(spark, url_csv):
    path, rows = url_csv
    edges = read_edgelist_csv(spark, path)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    urls, idx_edges, _ = oracle.ingest_edges(rows)
    exp = {(urls[s], urls[t]) for s, t in idx_edges}
    assert got == exp
    # dropped rows' URLs never become vertices
    res = pagerank(spark, edges, cfg=PageRankConfig(mode="reference", epsilon=1e-8))
    assert res.n_vertices == len(urls)
    x_urls, x, _ = oracle.pagerank_from_rows(rows, epsilon=1e-8)
    got_ranks = {r["id"]: r["rank"] for r in res.ranks.collect()}
    for u, v in zip(x_urls, x):
        assert got_ranks[u] == pytest.approx(v, abs=1e-6)


def test_max_nnz_caps_raw_rows(spark, url_csv):
    path, rows = url_csv
    edges = read_edgelist_csv(spark, path, max_nnz=2)  # rows 0..2 inclusive
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    urls, idx_edges, _ = oracle.ingest_edges(rows, max_nnz=2)
    exp = {(urls[s], urls[t]) for s, t in idx_edges}
    assert got == exp
    assert len(got) == 1  # rows 1,2 are regex-dropped; only row 0 survives


def test_cc_checkpoint_resume(spark, small_rows, tmp_path):
    from pagerank_project_spark.operators.components import connected_components
    from pagerank_project_spark.plans.checkpoint import CheckpointStore

    edges = spark.createDataFrame(pd.DataFrame(small_rows, columns=["src", "dst"]))
    full = {r["id"]: r["component"] for r in connected_components(spark, edges).labels.collect()}

    store = CheckpointStore(str(tmp_path), "cc")
    # driver_finish_edges=0 pins the DISTRIBUTED mid-run checkpoint/resume
    # path (the driver tail shortcut has its own tests in test_round3.py)
    connected_components(spark, edges, max_iterations=2, checkpoint_store=store, driver_finish_edges=0)
    assert store.latest_iteration() == 2
    res = connected_components(spark, edges, checkpoint_store=store, driver_finish_edges=0)
    resumed = {r["id"]: r["component"] for r in res.labels.collect()}
    assert resumed == full
    final = store.metrics()[store.latest_iteration()]
    assert final["algorithm"] == "star" and final["converged"]
    # a star-state store refuses to resume under propagation semantics
    with pytest.raises(ValueError):
        connected_components(spark, edges, checkpoint_store=store, algorithm="propagation")

    # propagation-mode resume keeps its own state/metrics shape
    pstore = CheckpointStore(str(tmp_path), "cc_prop")
    connected_components(spark, edges, max_iterations=2, checkpoint_store=pstore, algorithm="propagation")
    pres = connected_components(spark, edges, checkpoint_store=pstore, algorithm="propagation")
    presumed = {r["id"]: r["component"] for r in pres.labels.collect()}
    assert presumed == full
    assert pstore.metrics()[pstore.latest_iteration()]["changed_labels"] == 0


def test_repo_table_manifest_reader(spark, sf0001_fixture):
    from pagerank_project_spark.sources.repo_table import (
        ManifestError,
        read_manifest,
        read_source_table,
    )

    df = read_source_table(spark, sf0001_fixture, verify_rows=True)
    assert set(df.columns) >= {"repo", "path", "commit", "lang", "content", "content_sha256"}
    m = read_manifest(sf0001_fixture)
    assert m["rows"] == df.count()
    with pytest.raises(ManifestError):
        read_manifest("/tmp/does-not-exist")
