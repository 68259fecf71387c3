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
  md5-derived 48-bit base hashes + Kirsch–Mitzenmacher double-hashed
  permutations + array_min — ONE md5 per shingle, no UDFs) → banding
  (B bands × R rows, band key = the signature slice itself) → candidate
  pairs via per-band bucket self-join → exact-Jaccard rerank. The scale
  path: candidate generation touches only colliding docs; bucket skew is
  bounded by band width. Every stage is engine-portable (md5 + hex-int
  parse exist in Spark AND DuckDB) → the DuckDB oracle checks the EXACT
  candidate/pair set; recall-vs-exact pytests check quality.
- **SimHash**: 60-bit fingerprint (md5-derived token hashes, engine-
  portable) via vectorized Pandas UDF (numpy bit votes over token-hash
  arrays — the sanctioned Arrow slow path), near-dup = Hamming ≤ k via
  4×15-bit band blocking (exact for k ≤ 3 by pigeonhole), exact Hamming
  verify. Oracle-checkable end to end.

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

def _signatures_from_shingles(sh_base: DataFrame, num_perm: int, id_col: str) -> DataFrame:
    """(_id, shs: array<string>) → (id_col, sig: array<long>[num_perm]).

    CROSS-ENGINE-EXACT minhash (the md5 determinism pattern of
    traversal.random_walks): the per-shingle base hashes are two 48-bit
    integers parsed from md5(shingle) hex — md5 and hex-substring-to-int
    exist identically in Spark (`conv(substr(md5(s),1,12),16,10)`) and
    DuckDB (`('0x'||substr(md5(s),1,12))::BIGINT`) — and permutation i is
    Kirsch–Mitzenmacher double hashing h1 + i·h2 (mod 2³¹−1): ONE md5
    per shingle, 64 adds/mods, and every signature value is bit-equal in
    both engines, so the whole LSH pipeline is DuckDB-oracle-checkable.
    Overflow-safe: h1,h2 < P = 2³¹−1 and i < num_perm keeps h1+i·h2 well
    under 2⁶³."""
    doc = sh_base.select(
        F.col("_id").alias(id_col),
        F.transform("shs", lambda s: F.md5(s)).alias("md"),
    ).select(
        id_col,
        F.transform("md", lambda m: F.conv(F.substring(m, 1, 12), 16, 10).cast("long") % MERSENNE_P).alias("h1"),
        F.transform("md", lambda m: F.conv(F.substring(m, 13, 12), 16, 10).cast("long") % MERSENNE_P).alias("h2"),
    )
    mins = [
        F.array_min(
            F.zip_with("h1", "h2", lambda a, b: (a + F.lit(i) * b) % MERSENNE_P)
        ).alias(f"m{i}")
        for i in range(num_perm)
    ]
    return doc.select(id_col, F.array(*mins).alias("sig"))


def minhash_signatures(
    docs: DataFrame, num_perm: int = 64, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, sig: array<long>[num_perm]). Pure Catalyst: shingle →
    md5 → two 48-bit base hashes → double-hashed permutations → min.
    Engine-exact vs the DuckDB oracle (see _signatures_from_shingles)."""
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
    # band key = the signature slice rendered as a comma string — the join
    # key itself is engine-portable (no xxhash64), so the DuckDB oracle
    # reproduces the exact candidate set
    band_rows = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(",", *[F.element_at("sig", bi * r + j + 1) for j in range(r)]).alias("bh"),
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
SIMHASH_BITS = 60  # 15 md5 hex chars per token — parseable as one BIGINT in
#                    both Spark (conv) and DuckDB (hex cast), so fingerprints
#                    are engine-exact and the near-pair query oracle-checkable
SIMHASH_BANDS = 4  # 4 × 15-bit bands: ≥1 band equal is EXACT for hamming ≤ 3


def _simhash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """SIMHASH_BITS-wide SimHash per doc from its token-hash array — fully
    vectorized ACROSS the batch (no per-row Python): all token hashes
    concatenate into one flat array with a doc-index vector; per bit, the
    vote count is one ``np.bincount`` over the doc indices (constant-bound
    passes, each O(total_tokens)). Majority test is integer-exact
    (2·ones > n), so the fingerprint is a pure function of the token set
    and equals the DuckDB oracle's bit-sum formulation bitwise."""
    for pdf in batches:
        ndocs = len(pdf)
        out = np.zeros(ndocs, dtype=np.uint64)
        lens = pdf["hs"].map(len).to_numpy(np.int64)
        total = int(lens.sum())
        if total:
            flat = np.concatenate([np.asarray(h, dtype=np.uint64) for h in pdf["hs"]]) if ndocs else np.empty(0, np.uint64)
            doc_idx = np.repeat(np.arange(ndocs), lens)
            for bit in range(SIMHASH_BITS):
                ones = np.bincount(doc_idx, weights=((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.float64), minlength=ndocs)
                out |= (2 * ones > lens).astype(np.uint64) << np.uint64(bit)
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "simhash": out.astype(np.int64)})


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, simhash: long). Token hashes are the first 15 hex chars
    of md5(token) parsed as a 60-bit integer — computed engine-side in
    Catalyst and IDENTICAL in DuckDB (the md5 determinism pattern), so
    the fingerprint itself is cross-engine-exact; the bit-vote reduction
    is an Arrow-batched numpy kernel."""
    from pagerank_project_spark.operators.textstats import normalized_text

    toks = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
    hashed = _widen(docs).select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        ).alias("hs"),
    )
    return hashed.mapInPandas(_simhash_batches, schema=SIMHASH_SCHEMA)


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, **kw) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, blocked on
    4×15-bit bands (any equal band → candidate; exact for max_hamming ≤ 3
    by pigeonhole). → (a, b, hamming: long)."""
    r = SIMHASH_BITS // SIMHASH_BANDS
    fp = simhash_fingerprints(docs, **kw)
    bands = fp.select(
        F.col("doc_id").alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(F.lit(bi).alias("band"), F.shiftrightunsigned("simhash", r * bi).bitwiseAND(F.lit((1 << r) - 1)).alias("bh"))
                for bi in range(SIMHASH_BANDS)
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
        cand.withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("long"))
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
