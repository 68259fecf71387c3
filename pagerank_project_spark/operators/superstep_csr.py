"""CSR-block vectorized superstep (strategy 2) + hub salting.

BASELINE.json north_star mandates the SpMV path "expressed as DataFrame
joins plus vectorized pandas/Arrow UDFs performing the sparse
gather-scatter over per-partition CSR blocks (no per-row Python)".

Physical shape:

1. the weighted edge table is hash-partitioned ONCE by a salted source
   key and persisted; partitioning is reused every iteration.
2. per iteration, the rank vector is attached by an equi-join on src (the
   *gather* — broadcast when |V| permits, else co-partitioned shuffle),
3. ``mapInPandas`` then performs the *scatter*: inside each Arrow batch
   the edges form a sparse block of Pᵀ in CSR-by-row=dst form (built with
   ``pandas.factorize`` — the block's compressed row index — and summed
   with ``np.add.at``), emitting one partial sum per distinct dst in the
   block. No per-row Python: everything is numpy over Arrow columns.
4. a final ``groupBy(dst).sum`` reduces partials across blocks
   (shuffle-reduced, map-side combined).

Salting (SURVEY.md §2.6): a vertex with pathological out-degree (the hub
repo's entry file holds ~30% of cross-repo references in the fixture)
would otherwise pin all its edges to one partition of the src-hash
layout. Hub srcs (outdeg > threshold) get ``salt = pmod(xxhash64(dst),
S)`` so their edge lists split across S buckets; non-hubs keep salt 0.
The scatter result is salt-oblivious (partials are summed by dst anyway),
so correctness is unchanged — verified by the salting-on/off equivalence
test.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

CONTRIB_SCHEMA = "dst long, c double"  # dst = encoded vertex id (long)


def prepare_salted_edges(
    weighted: DataFrame,
    num_partitions: int,
    salt_buckets: int = 8,
    hub_degree_threshold: int | None = None,
) -> DataFrame:
    """(src, dst, w) → salted + hash-partitioned by (src, salt).

    hub_degree_threshold None → auto: max(256, 32 × mean out-degree).
    Caller persists the result; the partitioning survives via the cache.
    """
    outdeg = weighted.groupBy("src").agg(F.count("*").alias("_od"))
    if hub_degree_threshold is None:
        row = outdeg.agg(F.avg("_od").alias("m")).first()
        hub_degree_threshold = int(max(256, 32 * (row["m"] or 1.0)))
    hubs = outdeg.filter(F.col("_od") > hub_degree_threshold).select("src", "_od")
    e = (
        weighted.join(F.broadcast(hubs), "src", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_od").isNotNull(),
                F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_od")
    )
    return e.repartition(num_partitions, "src", "salt")


def _scatter_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch CSR scatter: partial Σ w·rank per dst (numpy only)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        # factorize = the block's compressed row index; bincount = the
        # scatter-add (measured ~20× faster than np.add.at on the codes)
        codes, uniques = pd.factorize(pdf["dst"], sort=False)
        sums = np.bincount(
            codes, weights=pdf["w"].to_numpy(np.float64) * pdf["rank"].to_numpy(np.float64)
        )
        yield pd.DataFrame({"dst": uniques, "c": sums})


def csr_partials(salted_edges: DataFrame, rank_side: DataFrame) -> DataFrame:
    """One superstep's α-free PARTIAL contributions: (dst, c) with one row
    per distinct dst per Arrow batch (the caller's groupBy finishes the
    reduction — map-side combined, so salting stays correctness-neutral).

    rank_side: (_src, rank) — pre-hinted broadcast() by the caller when the
    vertex count allows; otherwise a co-partitioned shuffle join.
    """
    joined = salted_edges.join(rank_side, salted_edges.src == F.col("_src"), "inner").select(
        "dst", "w", "rank"
    )
    return joined.mapInPandas(_scatter_batches, schema=CONTRIB_SCHEMA)
