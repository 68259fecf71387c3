"""Deterministic neighbor sampling — the GNN-training fan-out primitive.

A GraphSAGE/PinSage-style trainer over a web-scale link graph never
materializes full neighborhoods: it samples a fixed fan-out of K
neighbors per vertex per hop and trains on the induced computation
graphs. The reference engine (pagerank.py:100-139) consumes the FULL
adjacency every iteration; this module adds the bounded-adjacency
counterpart a training-data pipeline feeds to an embedding/GNN stage.

Determinism contract (same rationale as traversal.random_walks): the
kept neighbors of ``src`` are the K minimizing
``md5(src | dst | salt)`` (dst as tie-break) — a pure function of the
data, so the sample is invariant to partitioning, task retries, Spark
version, and engine, and the whole operator is DuckDB-oracle-checkable.
A seeded RNG per task would be none of those. Distinct salts yield
independent resamples (epoch-wise resampling in training).

Scale shape:
- the per-src top-K is ``row_number`` over ``partitionBy(src)`` +
  ``rn <= K``: Spark 4's ``InferWindowGroupLimit`` compiles this into a
  WindowGroupLimit with a PARTIAL stage before the exchange, so at most
  K candidate rows per src per map partition cross the wire — a
  10⁷-out-degree hub ships ≤ K·(map partitions) rows, not 10⁷ (plan
  pinned by ``test_neighbor_sample_plan_has_partial_window_group_limit``;
  same mechanism the LPA winner step relies on);
- ``khop_neighborhood`` grows the frontier by at most ×fanout per hop —
  the (root, id) pair count is bounded by |seeds|·Π fanouts, never by
  graph size — and joins it to the sampled adjacency with an explicit
  ``shuffle_hash`` hint (the sampled adjacency streams; no sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _sample_rank(salt: str) -> F.Column:
    # F.concat (NOT concat_ws) so NULL handling matches SQL `||` exactly:
    # both propagate NULL, where concat_ws would silently skip it and the
    # md5 sample order would diverge across engines for nullable inputs
    return F.md5(F.concat(F.col("src"), F.lit("|"), F.col("dst"), F.lit("|"), F.lit(salt)))


def sample_adjacency(edges: DataFrame, k: int, salt: str = "") -> DataFrame:
    """At most ``k`` out-neighbors per src, deterministically chosen by
    md5 order. → (src, dst), a subset of the distinct non-loop edge set.

    Ids MUST be strings: the ordering key is the rendered text
    ``src|dst|salt``, and numeric types render differently per engine
    (Spark ``1.0`` vs SQL ``1``), which would silently reorder the sample
    — enforced with a raise, matching ``neighbor_sample_sql``'s contract.
    NULL endpoints never reach the window (the non-loop filter drops them
    in both engines).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    types = dict(edges.select("src", "dst").dtypes)
    bad = {c: t for c, t in types.items() if t != "string"}
    if bad:
        raise TypeError(
            f"sample_adjacency requires string src/dst (md5 order is defined on the "
            f"rendered text and must match the SQL mirror); got {bad} — cast explicitly"
        )
    w = Window.partitionBy("src").orderBy(_sample_rank(salt).asc(), F.col("dst").asc())
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def khop_neighborhood(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int],
    salt: str = "",
) -> DataFrame:
    """GraphSAGE-style k-hop sampled computation graph.

    ``seeds``: DataFrame with an ``id`` column (the training roots).
    ``fanouts``: per-hop fan-out caps, e.g. [10, 5] = up to 10 hop-1
    neighbors per root, then up to 5 hop-2 neighbors of each of those.

    → (root, hop, src, dst): the sampled edges, hop = 1..len(fanouts).
    The adjacency sample is per-NODE per-hop (salt varies by hop), so two
    roots meeting the same vertex at the same hop share its sample — the
    standard one-pass mini-batch sampler shape, and what keeps the
    adjacency-side work independent of |seeds|.
    """
    if not fanouts:
        raise ValueError("fanouts must be non-empty")
    frontier = seeds.select(F.col("id").alias("root"), F.col("id"))
    out = None
    for hop, k in enumerate(fanouts, start=1):
        adj = sample_adjacency(edges, k, salt=f"{salt}|h{hop}")
        hop_edges = (
            frontier.join(adj.hint("shuffle_hash"), frontier["id"] == adj["src"])
            .select("root", F.lit(hop).alias("hop"), "src", "dst")
            .distinct()
        )
        out = hop_edges if out is None else out.unionByName(hop_edges)
        frontier = hop_edges.select("root", F.col("dst").alias("id")).distinct()
    return out


def neighbor_sample_sql(e_sql: str, k: int, salt: str = "") -> str:
    """ANSI-SQL mirror of ``sample_adjacency`` (DuckDB oracle): generated
    from the same ordering expression so the engines cannot drift."""
    return f"""
SELECT src, dst FROM (
  SELECT src, dst,
         row_number() OVER (
           PARTITION BY src
           ORDER BY md5(src || '|' || dst || '|' || '{salt}') ASC, dst ASC
         ) AS rn
  FROM (SELECT DISTINCT src, dst FROM ({e_sql}) WHERE src <> dst)
) WHERE rn <= {k}
"""
