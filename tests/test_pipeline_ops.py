"""Round-3 training-pipeline additions: near-dup clustering (pairs →
groups → canonical), deterministic hash-bucket sampling, and their
composition with the LSH candidate generator."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_project_spark.operators.dedup import (
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
)
from pagerank_project_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
)


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_fixture(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def _pairs_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))


def test_near_dup_clusters_transitive(spark):
    # 1≈2, 2≈3 (1 and 3 NOT directly similar) must collapse to ONE cluster;
    # 7≈9 independent; 20/21 absent from any pair -> absent from output
    out = near_dup_clusters(spark, _pairs_df(spark, [(1, 2), (2, 3), (7, 9)]))
    got = {r.doc_id: (r.canonical_id, r.cluster_size) for r in out.collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 9: (7, 2)}


def test_near_dup_clusters_numeric_canonical(spark):
    # min NUMERIC id, not min string: cluster {2, 10} keeps 2 ("10" < "2")
    out = near_dup_clusters(spark, _pairs_df(spark, [(10, 2)]))
    got = {r.doc_id: r.canonical_id for r in out.collect()}
    assert got == {2: 2, 10: 2}


def test_lsh_clusters_consistent_with_exact(spark, docs_fixture):
    """Production path (MinHash-LSH pairs → clusters) agrees with the exact
    path wherever LSH recalled the pair: docs the exact clustering put
    together AND whose pair survived LSH banding land in one LSH cluster."""
    exact_pairs = ngram_jaccard_pairs(docs_fixture, threshold=0.5)
    lsh_pairs = minhash_lsh_pairs(docs_fixture, threshold=0.5)
    lsh_set = {(r.a, r.b) for r in lsh_pairs.collect()}
    assert lsh_set, "fixture should contain near-duplicates"
    lsh_clusters = {
        r.doc_id: r.canonical_id for r in near_dup_clusters(spark, lsh_pairs).collect()
    }
    for r in exact_pairs.collect():
        if (r.a, r.b) in lsh_set:
            assert lsh_clusters[r.a] == lsh_clusters[r.b]


def test_hash_sample_partition_invariant(spark):
    """The kept set is a function of the data only — identical under any
    partitioning (the property df.sample() does NOT have)."""
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 20).collect()}
    b = {r.k for r in hash_sample(df.repartition(17), "k", 20).collect()}
    assert a == b
    # ~20% within loose tolerance
    assert 0.15 * 5000 < len(a) < 0.25 * 5000


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 20, salt="x").collect()}
    b = {r.k for r in hash_sample(df, "k", 20, salt="y").collect()}
    assert a != b
    # independent 20% samples overlap ~4%
    assert len(a & b) < 0.1 * 5000


def test_hash_bucket_matches_duckdb(spark):
    """Cross-engine replay — the reason the bucket is md5-based: any engine
    can recompute membership for audits/oracles."""
    import duckdb

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    got = {r.k: r.b for r in df.select("k", hash_bucket(F.col("k"), "s").alias("b")).collect()}
    want = {
        k: b
        for k, b in duckdb.sql(
            "SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR) || 's'), 1, 8) AS BIGINT) % 100 "
            "FROM range(500) t(k)"
        ).fetchall()
    }
    assert got == want


def test_stratified_rates(spark):
    df = spark.range(0, 9000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("s")
    )
    kept = stratified_hash_sample(df, "k", F.col("s"), {"0": 50, "1": 10}, default_pct=0)
    counts = {r.s: r.n for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts.get("2") is None  # default 0% -> stratum fully dropped
    assert 0.4 * 3000 < counts["0"] < 0.6 * 3000
    assert 0.05 * 3000 < counts["1"] < 0.15 * 3000


def test_sample_rejects_bad_pct(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_sample(df, "k", 101)
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "k", F.lit("x"), {"x": -1})
