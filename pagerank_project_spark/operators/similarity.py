"""Similarity search over embedding columns (array<float>).

Two paths, as the driver brief mandates:

- **brute-force cosine top-k** (the baseline / exact verifier),
  DISTRIBUTED: the QUERY side (small by construction — you ask for
  neighbors of a bounded query set) is collected and broadcast once; the
  CORPUS side — the unbounded one at 100 TB — never leaves the executors.
  Each corpus Arrow batch is one BLAS matmul against the query matrix;
  the kernel emits, per query, every candidate tied-or-above the batch's
  k-th score (ties kept so the global cut is exact), and a
  ``groupBy(vec_id)`` Window top-k merges the per-batch partials.
  Fully vectorized: candidate selection is one ``np.partition`` +
  boolean-mask per batch — no per-row/per-query Python loop.
  Exact; cost O(|Q|·|C|·d) spread across the corpus partitions.
- **LSH-bucketed cosine** (the scale path for query=corpus all-pairs):
  random-hyperplane signatures (sign bits of r Gaussian projections,
  seeded) computed engine-side via a vectorized Pandas UDF; candidates =
  bucket collisions on any of B sign-bands; exact cosine rerank on
  candidates only. Recall < 1 by construction — tests assert recall vs
  brute force on fixtures. The hyperplanes are a pure function of
  (bands, rows, dim, seed) and projections are rounded to 6dp before the
  sign, so the DuckDB oracle (same constants embedded as literals)
  reproduces buckets, candidates, and the final top-k EXACTLY.

Cosines are computed in float64 and rounded to 6 dp so the DuckDB oracle
(`list_cosine_similarity` over the same parquet) hash-matches; the
global (cosine desc, neighbor asc) row_number cut is identical on both
sides, so the top-k sets hash-match too.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOPK_SCHEMA = "vec_id long, neighbor long, cosine double"

# queries are broadcast to every executor: cap the collected side. 2M × 128
# floats ≈ 2 GB — beyond this, bucket the queries (LSH path) or shard them.
QUERY_BROADCAST_LIMIT = 2_000_000


def _unit_rows(vectors: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vectors, axis=1)
    norms[norms == 0] = 1.0
    return vectors / norms[:, None]


def lsh_planes(bands: int, rows_per_band: int, dim: int, seed: int) -> np.ndarray:
    """The (bands·rows_per_band, dim) Gaussian hyperplane matrix — a pure
    function of its arguments, exposed so the DuckDB oracle generator can
    embed the IDENTICAL constants as SQL literals (the signatures are then
    cross-engine-exact; see _lsh_signatures' rounding note)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bands * rows_per_band, dim))


def det_centroids(n_centroids: int, dim: int, seed: int = 29) -> np.ndarray:
    """Data-independent coarse quantizer: seeded uniform[-0.5,0.5) rows,
    L2-normalized. A pure function of (n_centroids, dim, seed) — the
    contract query and its DuckDB oracle both call this, so the IVF cell
    assignment is checkable end-to-end without shipping trained state.
    For isotropic embedding distributions random directions partition the
    sphere about as evenly as trained ones; use ``train_centroids`` when
    the corpus is clustered."""
    rng = np.random.default_rng(seed)
    return _unit_rows(rng.random((n_centroids, dim)) - 0.5)


def brute_force_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self excluded
    when ids collide). → (vec_id, neighbor, cosine) — ties broken by
    neighbor id asc for determinism.

    The corpus is NEVER collected: it streams through ``mapInPandas``
    shard-by-shard while the (bounded, asserted) query matrix rides along
    as a broadcast. Scales to an arbitrarily large corpus — the 100 TB
    shape — with a final |Q|·k-sized Window merge.
    """
    qpdf = queries.select(id_col, vec_col).limit(QUERY_BROADCAST_LIMIT + 1).toPandas()
    if len(qpdf) > QUERY_BROADCAST_LIMIT:
        raise ValueError(
            f"query side exceeds the broadcast budget ({QUERY_BROADCAST_LIMIT} rows); "
            "shard the queries or use lsh_topk for all-pairs workloads"
        )
    qids = qpdf[id_col].to_numpy(np.int64)
    qmat = _unit_rows(np.stack(qpdf[vec_col].to_numpy()).astype(np.float64))
    b_qids = spark.sparkContext.broadcast(qids)
    b_qmat = spark.sparkContext.broadcast(qmat)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Qids, Q = b_qids.value, b_qmat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            cids = pdf[id_col].to_numpy(np.int64)
            # round BEFORE ranking so the (cosine desc, id asc) order is
            # reproducible across engines with different fp sum order
            sims = np.round(Q @ cmat.T, 6)  # one BLAS call per batch
            sims[Qids[:, None] == cids[None, :]] = -np.inf  # exclude self
            kk = min(k, sims.shape[1])
            # per-query k-th score in this batch; emit everything ≥ it
            # (ties INCLUDED — the global Window applies the exact
            # (cosine desc, neighbor asc) cut, so no candidate that could
            # win globally is dropped locally). Pure numpy; no row loop.
            thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1]
            mask = (sims >= thresh[:, None]) & np.isfinite(sims)
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {"vec_id": Qids[qi], "neighbor": cids[ci], "cosine": sims[qi, ci]}
            )

    partials = corpus.select(id_col, vec_col).mapInPandas(kernel, schema=TOPK_SCHEMA)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        partials.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


ASSIGN_SCHEMA = "vec_id long, cell int"


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: seeded Lloyd iterations on a
    bounded, deterministic sample (lowest ids). Sample and centroid count
    are driver-bounded by construction — the corpus itself never leaves
    the executors."""
    spdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    x = _unit_rows(np.stack(spdf[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    init = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    cents = x[np.sort(init)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):  # bounded by n_centroids (small)
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cents[c] = m / nrm
    return cents


def ivf_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate all-pairs cosine top-k via IVF (inverted file): corpus
    vectors are bucketed by nearest coarse centroid (one vectorized Arrow
    pass); each query probes its ``nprobe`` nearest cells; candidates =
    cell-bucket join (never all-pairs); exact expression-level cosine
    rerank + Window top-k. Recall grows with nprobe/n_centroids — tests
    assert a floor vs brute force. → (vec_id, neighbor, cosine).

    ``centroids``: pass an explicit (n, dim) quantizer (e.g.
    ``det_centroids`` — the oracle-checkable contract path) instead of
    training one on the corpus sample. Centroid similarities are rounded
    to 6dp before argmax/argsort (ties → lowest cell), so cell assignment
    is a deterministic engine-exact function of the data + centroids."""
    cents = (
        centroids
        if centroids is not None
        else train_centroids(embeddings, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col)
    )
    b_cents = spark.sparkContext.broadcast(cents)

    def assign_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cents.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = np.round(v @ C.T, 6)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(np.int64), "cell": sims.argmax(axis=1).astype(np.int32)}
            )

    def probe_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = b_cents.value
        npr = min(nprobe, len(C))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = np.round(v @ C.T, 6)
            # stable sort: ties broken by LOWEST cell index, matching the
            # oracle's (sim DESC, cell ASC) row_number cut exactly
            cells = np.argsort(-sims, axis=1, kind="stable")[:, :npr]  # (n, nprobe)
            ids = np.repeat(pdf[id_col].to_numpy(np.int64), npr)
            yield pd.DataFrame({"vec_id": ids, "cell": cells.reshape(-1).astype(np.int32)})

    vecs = embeddings.select(id_col, vec_col)
    assigned = vecs.mapInPandas(assign_kernel, schema=ASSIGN_SCHEMA)
    probes = vecs.mapInPandas(probe_kernel, schema=ASSIGN_SCHEMA)
    cand = (
        probes.alias("q")
        .join(assigned.alias("c"), "cell")
        .filter(F.col("q.vec_id") != F.col("c.vec_id"))
        .select(F.col("q.vec_id").alias("a"), F.col("c.vec_id").alias("b"))
        .distinct()
    )
    return _exact_rerank_topk(cand, vecs, k, id_col, vec_col)


SIG_SCHEMA = "vec_id long, band int, bh long"


def _lsh_signatures(
    spark: SparkSession,
    embeddings: DataFrame,
    bands: int,
    rows_per_band: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Random-hyperplane band signatures → (vec_id, band, bh). Shared by
    ``lsh_topk`` and ``cosine_near_pairs``; one Arrow pass, bit-packing
    vectorized per band."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    planes = lsh_planes(bands, rows_per_band, dim, seed)
    b_planes = spark.sparkContext.broadcast(planes)

    def sig_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_planes.value
        weights = (1 << np.arange(rows_per_band, dtype=np.int64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # round the projections to 6dp BEFORE taking the sign: BLAS
            # and the oracle's sequential list_dot_product differ in the
            # last ulps, and rounding makes the sign (hence every bucket)
            # engine-exact — the same discipline as the cosine rerank
            bits = np.round(v @ P.T, 6) > 0  # (n, bands*r)
            ids = pdf[id_col].to_numpy(np.int64)
            frames = []
            for bi in range(bands):
                chunk = bits[:, bi * rows_per_band : (bi + 1) * rows_per_band]
                bh = chunk.astype(np.int64) @ weights
                frames.append(pd.DataFrame({"vec_id": ids, "band": bi, "bh": bh}))
            yield pd.concat(frames)

    return embeddings.select(id_col, vec_col).mapInPandas(sig_kernel, schema=SIG_SCHEMA)


def lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    k: int = 10,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH banding +
    exact rerank of bucket collisions. → (vec_id, neighbor, cosine)."""
    sigs = _lsh_signatures(spark, embeddings, bands, rows_per_band, seed, id_col, vec_col)
    cand = (
        sigs.alias("x")
        .join(sigs.alias("y"), ["band", "bh"])
        .filter(F.col("x.vec_id") != F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    return _exact_rerank_topk(cand, vecs, k, id_col, vec_col)


NEAR_PAIRS_SCHEMA = "a long, b long, cosine double"


def cosine_near_pairs(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = 0.9,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 23,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine NEAR-DUP pairs (the scale path): random-hyperplane
    LSH banding proposes candidates (never all-pairs — same bucketing
    discipline as MinHash-LSH on text), then an exact expression-level
    cosine rerank keeps pairs ≥ ``threshold``. → (a, b, cosine), a < b.

    Recall is the banding collision curve 1-(1-p^r)^b with
    p = 1 - arccos(cos θ)/π — near 1.0 for true near-dups (cos ≥ 0.9)
    at the defaults; tests assert a planted-duplicate recall floor and
    candidates ⊆ exact. Use ``cosine_near_pairs_exact`` as the bounded
    verifier / oracle twin."""
    sigs = _lsh_signatures(spark, embeddings, bands, rows_per_band, seed, id_col, vec_col)
    cand = (
        sigs.alias("x")
        .join(sigs.alias("y"), ["band", "bh"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    vecs = embeddings.select(F.col(id_col), F.col(vec_col))
    return _pair_cosines(cand, vecs, id_col, vec_col).filter(F.col("cosine") >= threshold)


def cosine_near_pairs_exact(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs — the verifier twin of
    ``cosine_near_pairs`` (role of ``ngram_jaccard_pairs`` vs MinHash-LSH):
    all pairs (a < b) with cosine ≥ ``threshold``. The vector set rides
    along as a bounded, hard-guarded broadcast matrix while the corpus
    STREAMS through ``mapInPandas`` (one BLAS product per Arrow batch;
    nothing unbounded ever reaches the driver) — so it scales in the
    corpus dimension, and the quadratic term is explicit in the broadcast
    budget. Rounds to 6 decimals BEFORE thresholding so the cut is
    reproducible across engines with different fp sum orders."""
    qpdf = embeddings.select(id_col, vec_col).limit(QUERY_BROADCAST_LIMIT + 1).toPandas()
    if len(qpdf) > QUERY_BROADCAST_LIMIT:
        raise ValueError(
            f"vector set exceeds the broadcast budget ({QUERY_BROADCAST_LIMIT} rows); "
            "use cosine_near_pairs (LSH-bucketed) for unbounded near-dup workloads"
        )
    qids = qpdf[id_col].to_numpy(np.int64)
    qmat = _unit_rows(np.stack(qpdf[vec_col].to_numpy()).astype(np.float64))
    b_qids = spark.sparkContext.broadcast(qids)
    b_qmat = spark.sparkContext.broadcast(qmat)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Qids, Q = b_qids.value, b_qmat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = _unit_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            cids = pdf[id_col].to_numpy(np.int64)
            sims = np.round(Q @ cmat.T, 6)
            mask = (sims >= threshold) & (Qids[:, None] < cids[None, :])
            qi, ci = np.nonzero(mask)
            yield pd.DataFrame({"a": Qids[qi], "b": cids[ci], "cosine": sims[qi, ci]})

    return embeddings.select(id_col, vec_col).mapInPandas(kernel, schema=NEAR_PAIRS_SCHEMA)


def _pair_cosines(cand: DataFrame, vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Exact cosine over candidate pairs (a, b) → (a, b, cosine),
    expression-level (zip_with + aggregate, float64, codegen'd — no
    Python in this path), rounded to 6 decimals."""
    pairs = (
        cand.join(vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va")), "a")
        .join(vecs.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb")), "b")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, z: a + z))  # noqa: E731
    return pairs.select(
        "a", "b", F.round(dot / (nrm(F.col("va")) * nrm(F.col("vb"))), 6).alias("cosine")
    )


def _exact_rerank_topk(cand: DataFrame, vecs: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    """Exact cosine over candidate pairs + per-query Window top-k."""
    scored = _pair_cosines(cand, vecs, id_col, vec_col).select(
        F.col("a").alias("vec_id"), F.col("b").alias("neighbor"), "cosine"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")
