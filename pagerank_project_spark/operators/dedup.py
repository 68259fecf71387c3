"""Deduplication operators for training-data pipelines.

Four tiers, all over the ``documents`` table:

- **exact**: group by md5 of normalized text (portable to DuckDB → exact
  oracle). Canonical doc = min doc_id per group.
- **n-gram Jaccard**: exact pairwise similarity on distinct word-3-gram
  shingle sets via explode + self-join on shingle (SQL-expressible in
  DuckDB → exact oracle). This is the brute-force verifier; its shuffle
  is O(Σ postings²) per shingle, so at scale it runs AFTER candidate
  pruning, not instead of it.
- **MinHash + LSH**: shingle → 64-perm MinHash signature (pure Catalyst:
  xxhash64 + universal-hash transforms + array_min — no UDFs) → banding
  (B bands × R rows, band key = hash of signature slice) → candidate
  pairs via per-band bucket self-join → exact-Jaccard rerank. The scale
  path: candidate generation touches only colliding docs; bucket
  skew is bounded by band width. Signature math is engine-side only
  (xxhash64 isn't portable) → pytest oracle checks containment +
  recall vs the exact pairs, and the rerank stage guarantees precision.
- **SimHash**: 64-bit fingerprint via vectorized Pandas UDF (numpy bit
  ops over token-hash arrays — the sanctioned Arrow slow path), near-dup
  = Hamming ≤ k via 4×16-bit band blocking, exact Hamming verify.

Weighting note: signatures use DISTINCT shingles (set semantics), like
the reference treats a page's link set relationally rather than by
multiplicity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# 2^31-1: keeps (h·a+b) < 2^62 — no int64 overflow under ANSI arithmetic
MERSENNE_P = (1 << 31) - 1


def _widen(docs: DataFrame) -> DataFrame:
    """Ensure the expensive per-document expression scans (normalize +
    shingle regexes) run at cluster parallelism: a small file count (e.g.
    ONE parquet file at bench scale) otherwise serializes the whole scan
    onto that many tasks. Repartition only when the source is narrower
    than the session's parallelism — at real scale the input already has
    thousands of splits and this is a no-op."""
    spark = docs.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if docs.rdd.getNumPartitions() < nparts:
        return docs.repartition(nparts)
    return docs


def shingles(text, n: int = 3):
    """Distinct word n-gram shingles of the normalized text (array).

    Formulated as n array slices zipped together — NEVER as a lambda that
    references the outer token array (``element_at(toks, i+j)`` inside a
    ``transform`` re-evaluates the whole split+regex-normalization chain
    PER ELEMENT — Catalyst does not CSE across higher-order-function
    invocations; measured 13× slower on the sf0.1 documents scan). Here
    every expression references ``toks`` at row level, where codegen's
    subexpression elimination applies."""
    from pagerank_project_spark.operators.textstats import normalized_text

    toks = F.split(normalized_text(text), " ")
    cnt = F.size(toks) - (n - 1)
    parts = [F.slice(toks, j + 1, cnt) for j in range(n)]
    zipped = parts[0]
    for p in parts[1:]:
        zipped = F.zip_with(zipped, p, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(
        F.when(F.size(toks) >= n, zipped).otherwise(F.array(F.concat_ws(" ", toks)))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (fp, n_docs, canonical_id) per duplicate group (n_docs ≥ 2)."""
    from pagerank_project_spark.operators.textstats import fingerprint

    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (brute force / verifier)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) ≥ threshold.
    → (a, b, jaccard) with jaccard rounded to 6 dp (oracle-hash friendly)."""
    docs = _widen(docs)
    sh = docs.select(F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), n)).alias("sh")).distinct()
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .filter(F.col("x._id") < F.col("y._id"))
        .groupBy(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sa")), "a")
        .join(F.broadcast(sizes.withColumnRenamed("_id", "b").withColumnRenamed("sz", "sb")), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int, seed: int = 17) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def _signatures_from_shingles(sh_base: DataFrame, num_perm: int, id_col: str) -> DataFrame:
    """(_id, shs: array<string>) → (id_col, sig: array<long>[num_perm])."""
    doc = sh_base.select(
        F.col("_id").alias(id_col),
        F.transform("shs", lambda s: F.abs(F.xxhash64(s)) % MERSENNE_P).alias("hs"),
    )

    def perm_fn(a: int, b: int):
        # factory → single-arg lambda (extra default args would change the
        # arity PySpark infers for the higher-order function)
        return lambda h: (h * F.lit(a) + F.lit(b)) % MERSENNE_P

    mins = [
        F.array_min(F.transform(F.col("hs"), perm_fn(a, b))).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]
    return doc.select(id_col, F.array(*mins).alias("sig"))


def minhash_signatures(
    docs: DataFrame, num_perm: int = 64, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, sig: array<long>[num_perm]). Pure Catalyst: shingle →
    xxhash64 → per-permutation universal hash (a·h+b mod 2³¹−1) → min."""
    sh_base = _widen(docs).select(F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("shs"))
    return _signatures_from_shingles(sh_base, num_perm, id_col)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs via LSH banding, reranked by EXACT Jaccard.

    rows-per-band r = num_perm // bands; collision prob at similarity s is
    1-(1-s^r)^bands (S-curve). Output ⊆ ngram_jaccard_pairs(threshold);
    recall < 1 is inherent to LSH (asserted ≥0.9 on fixtures in tests).
    → (a, b, jaccard)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    # the shingle set feeds BOTH the signature path and the exact-Jaccard
    # rerank — materialize it once (regex+normalize over full text is the
    # expensive scan)
    sh_base = _widen(docs).select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("shs")
    ).persist()
    sig = _signatures_from_shingles(sh_base, num_perm, id_col)
    band_rows = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[F.element_at("sig", bi * r + j + 1) for j in range(r)])).alias("bh"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")
    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "bh"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("a"), F.col("y._id").alias("b"))
        .distinct()
    )
    # exact-Jaccard rerank of candidates only (reuses the cached shingles)
    sh = sh_base.select("_id", F.explode("shs").alias("sh")).distinct()
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col("_id").alias("a"), "sh"), "a")
        .join(sh.select(F.col("_id").alias("b"), F.col("sh").alias("sh_b")), "b")
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes.select(F.col("_id").alias("a"), F.col("sz").alias("sa"))), "a")
        .join(F.broadcast(sizes.select(F.col("_id").alias("b"), F.col("sz").alias("sb"))), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_SCHEMA = "doc_id long, simhash long"


def _simhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """64-bit SimHash per doc from its token-hash array — fully vectorized
    ACROSS the batch (no per-row Python): all token hashes concatenate
    into one flat array with a doc-index vector; per bit, the vote count
    is one ``np.bincount`` over the doc indices (64 constant-bound
    passes, each O(total_tokens))."""
    for pdf in batches:
        ndocs = len(pdf)
        out = np.zeros(ndocs, dtype=np.uint64)
        lens = pdf["hs"].map(len).to_numpy(np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate([np.asarray(h, dtype=np.uint64) for h in pdf["hs"]]) if ndocs else np.empty(0, np.uint64)
            doc_idx = np.repeat(np.arange(ndocs), lens)
            half = lens.astype(np.float64) / 2.0  # ones > tokens/2 ⇔ votes > 0
            for bit in range(64):
                ones = np.bincount(doc_idx, weights=((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.float64), minlength=ndocs)
                out |= (ones > half).astype(np.uint64) << np.uint64(bit)
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "simhash": out.astype(np.int64)})


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, simhash: long). Token hashes computed engine-side
    (xxhash64); the bit-vote reduction is an Arrow-batched numpy kernel."""
    from pagerank_project_spark.operators.textstats import normalized_text

    toks = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
    hashed = _widen(docs).select(
        F.col(id_col).alias("doc_id"), F.transform(toks, lambda t: F.xxhash64(t)).alias("hs")
    )
    return hashed.mapInPandas(_simhash_batches, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, blocked on
    4×16-bit bands (any equal band → candidate; exact for max_hamming ≤ 3
    by pigeonhole). → (a, b, hamming)."""
    fp = simhash_fingerprints(docs, **kw)
    bands = fp.select(
        F.col("doc_id").alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(F.lit(bi).alias("band"), F.shiftrightunsigned("simhash", 16 * bi).bitwiseAND(F.lit(0xFFFF)).alias("bh"))
                for bi in range(4)
            ])
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bh")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bh"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(
            F.col("x._id").alias("a"),
            F.col("y._id").alias("b"),
            F.col("x.simhash").alias("fa"),
            F.col("y.simhash").alias("fb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (pairs → groups → canonical representative)
# ---------------------------------------------------------------------------

def near_dup_clusters(spark, pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Cluster candidate near-duplicate PAIRS into duplicate GROUPS and
    elect a canonical representative per group — the keep-one step of a
    dedup pipeline (A≈B and B≈C must collapse to ONE kept doc even when
    A≉C directly; pairwise drop-the-second would keep two of the three).

    Transitive closure = connected components over the pair graph, so this
    composes the engine's star-contraction CC operator (O(log n) rounds,
    hub-skew-safe — see operators/components.py). The pair graph is tiny
    relative to the corpus (only docs with ≥1 near-dup appear), so every
    doc in the output belongs to a cluster of size ≥ 2 by construction;
    the caller anti-joins ``doc_id != canonical_id`` rows against the
    corpus to drop them.

    Canonical = MIN NUMERIC doc id in the cluster — recomputed here from
    the member ids, independent of CC's internal label convention (star
    mode labels by min STRING, where "10" < "2").

    → (doc_id, canonical_id, cluster_size)
    """
    from .components import connected_components

    numeric = {"tinyint", "smallint", "int", "bigint"}
    types = dict(pairs.dtypes)
    bad = [c for c in (a_col, b_col) if types.get(c) not in numeric]
    if bad:
        # the canonical-id election below casts members to long; a string id
        # like "doc-7" would become a silent NULL canonical_id instead of a
        # deterministic representative
        raise ValueError(
            f"near_dup_clusters requires integer ids; column(s) {bad} have types "
            f"{[types.get(c) for c in bad]} — map ids to integers first (e.g. via "
            "vids.string_sorted_vids) or extend the election to a type-preserving min"
        )
    edges = pairs.select(
        F.col(a_col).cast("string").alias("src"), F.col(b_col).cast("string").alias("dst")
    )
    labels = connected_components(spark, edges).labels
    members = labels.select(F.col("id").cast("long").alias("doc_id"), "component")
    stats = members.groupBy("component").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("cluster_size")
    )
    return members.join(stats, "component").select("doc_id", "canonical_id", "cluster_size")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: (doc_id, bench_id, n_shared) for every
    corpus document sharing ≥ ``min_shared`` DISTINCT word n-grams with a
    benchmark document — the overlap report a training pipeline uses to
    drop eval-set leakage before training.

    Scale shape: both sides reduce to distinct (id, shingle) rows (the
    same pure-Catalyst slice+zip_with shingle expression as MinHash); the
    contamination join keys on the shingle. The BENCHMARK side is small
    by construction (eval suites are ~10⁵ docs vs a 10¹⁰-doc corpus), so
    the optimizer broadcasts it and the corpus scan never shuffles; the
    per-pair count is a map-side-combined groupBy. Hot shingles
    (stop-phrase grams) only blow up if they are IN the benchmark —
    raising ``n`` is the standard damper (real pipelines use 8-13-gram
    windows; the small synthetic fixture uses n=3). All-integer output —
    the DuckDB oracle (`decontamination`) matches exactly."""
    sh_d = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    sh_b = (
        bench.select(F.col(id_col).alias("bench_id"), F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    out = (
        sh_d.join(sh_b, "sh")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return out.filter(F.col("n_shared") >= min_shared) if min_shared > 1 else out
