"""TrustRank and spam mass — seed-based link-spam estimation.

The reference engine exposes a personalization vector (reference
pagerank.py:81-97, make_personalization_vector); TrustRank (Gyongyi,
Garcia-Molina, Pedersen, VLDB'04) is exactly that machinery pointed at
an anti-spam goal: teleport only to a hand-audited TRUSTED seed set, so
rank can only flow out of pages reachable from trust. Spam mass
(Gyongyi et al., "Link Spam Detection Based on Mass Estimation") then
scores every page by how much of its ordinary PageRank is NOT explained
by trust flow: m(u) = (p(u) - t(u)) / p(u) — near 1 for pages whose
rank comes from link farms, near 0 (or negative) for pages the trusted
core endorses.

Spark-first shape: both vectors come from the SAME pagerank() operator
(same superstep plan, same skew machinery); this module only composes
two runs and one final join. At scale the two runs share a prepared
graph (the expensive encode/bucket step is paid once), and the final
join is vertex-sized, never edge-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from pagerank_project_spark.config import PageRankConfig
from pagerank_project_spark.operators.pagerank import pagerank


def trust_rank(
    spark: SparkSession,
    edges: DataFrame | None = None,
    trusted_expr: Column | None = None,
    vertices: DataFrame | None = None,
    cfg: PageRankConfig | None = None,
    prepared=None,
):
    """PageRank with teleport restricted to a trusted seed set.

    ``trusted_expr``: boolean predicate over the vertex ``id`` column
    (required — an all-zero indicator raises inside pagerank, reference
    pagerank.py:94 semantics). Thin alias of pagerank(v_expr=...) so the
    anti-spam intent is a named, documented operator.
    """
    if trusted_expr is None:
        raise ValueError("trust_rank requires a trusted-seed indicator expression")
    return pagerank(
        spark, edges, vertices=vertices, cfg=cfg, v_expr=trusted_expr, prepared=prepared
    )


def spam_mass(
    spark: SparkSession,
    edges: DataFrame | None = None,
    trusted_expr: Column | None = None,
    vertices: DataFrame | None = None,
    cfg: PageRankConfig | None = None,
    prepared=None,
) -> DataFrame:
    """Relative spam mass of every vertex: (id, rank, trust, spam_mass)
    with rank = uniform-teleport PageRank, trust = TrustRank over
    ``trusted_expr`` seeds, spam_mass = (rank - trust) / rank.

    rank > 0 always (the uniform teleport term reaches every vertex), so
    the division is total. Both runs use the same cfg (mode, alpha,
    iteration budget) — spam mass is only meaningful when p and t come
    from the same operator at the same settings.
    """
    base = pagerank(spark, edges, vertices=vertices, cfg=cfg, prepared=prepared)
    trust = trust_rank(
        spark, edges, trusted_expr=trusted_expr, vertices=vertices, cfg=cfg,
        prepared=prepared,
    )
    t = trust.ranks.select("id", F.col("rank").alias("trust"))
    return (
        base.ranks.join(t.hint("shuffle_hash"), "id")
        .select(
            "id",
            "rank",
            "trust",
            ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
        )
    )
