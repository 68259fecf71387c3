"""Link prediction — common-neighbor scores (counts, Jaccard, Adamic-Adar)
over the distance-2 candidate set.

For every non-adjacent pair (u, v) sharing ≥1 neighbor:

    common      = |N(u) ∩ N(v)|
    jaccard     = common / (|N(u)| + |N(v)| − common)
    adamic_adar = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))      (Adamic & Adar 2003)

Candidate generation is the wedge join (both endpoints neighbors of the
same apex w), which is inherently Θ(Σ_w deg(w)²) — unlike the triangle
count there is no orientation trick, because EVERY common neighbor must
be witnessed, not just one per closed triple. The scale lever is
``max_apex_degree``: ultra-hub apexes contribute quadratically many
wedges yet near-zero evidence each (1/ln(deg) → 0 — the stop-word analog
of link graphs), so production runs cap the apex degree; default None
keeps the operator exact for oracle checks. Within that shape everything
is combiner-friendly: the per-(u, v) agg is a map-side-combined groupBy,
existing edges fall out via a left-anti join on the canonical pair, and
the global top-k physicalizes as TakeOrderedAndProject (never a
single-task full sort).

Cross-engine determinism: adamic_adar is ROUNDED to 6 decimals inside the
aggregation (before ranking) in both this plan and the DuckDB oracle, so
ulp-level ln()/summation-order differences cannot flip the k-th spot;
ties break on the pair itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pagerank_project_spark.operators.components import undirected_edges


def link_prediction_topk(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 50,
    max_apex_degree: int | None = None,
    wedge_budget: int = 2_000_000_000,
    exact: bool = False,
) -> DataFrame:
    """Top-k candidate links by Adamic-Adar (desc, then pair asc). Output
    (src, dst, common, adamic_adar, jaccard) with src < dst.

    Uncapped exact mode is Θ(Σ deg²): a single 10⁷-degree hub is a
    10¹⁴-wedge stage. When no ``max_apex_degree`` cap is given, the wedge
    count is estimated up front from the degree table (one cheap
    map-side-combined agg over data the plan needs anyway) and the run
    REFUSES above ``wedge_budget`` unless ``exact=True`` — the scale-unsafe
    setting must be an explicit opt-in, not the default."""
    und = undirected_edges(edges).persist()
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))

    if max_apex_degree is None and not exact:
        est = deg.agg(F.sum(F.col("deg") * F.col("deg")).alias("w")).first()["w"] or 0
        if est > wedge_budget:
            und.unpersist()
            raise ValueError(
                f"estimated wedge count {est:,} exceeds wedge_budget {wedge_budget:,}; "
                "pass max_apex_degree to cap ultra-hub apexes (they contribute "
                "quadratically many wedges of near-zero Adamic-Adar evidence each), "
                "or exact=True to force the uncapped quadratic run"
            )

    apex = und.join(deg.hint("shuffle_hash"), "src")
    if max_apex_degree is not None:
        apex = apex.filter(F.col("deg") <= max_apex_degree)
    # 1/ln(deg) is +Inf for deg-1 apexes, but those can't form a wedge
    # (u < v needs two distinct neighbors) so the value never aggregates
    a = apex.select(
        F.col("src").alias("w"), F.col("dst").alias("u"),
        (1.0 / F.log(F.col("deg"))).alias("aa_w"),
    )
    b = (und if max_apex_degree is None else apex).select(
        F.col("src").alias("w"), F.col("dst").alias("v")
    )
    wed = a.join(b, "w").filter(F.col("u") < F.col("v"))
    scores = wed.groupBy("u", "v").agg(
        F.count("*").alias("common"),
        F.round(F.sum("aa_w"), 6).alias("adamic_adar"),
    )
    exist = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = (
        scores.join(exist, ["u", "v"], "left_anti")
        .join(deg.select(F.col("src").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("src").alias("v"), F.col("deg").alias("dv")), "v")
    )
    out = (
        cand.select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            "common",
            "adamic_adar",
            F.round(
                F.col("common") / (F.col("du") + F.col("dv") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("adamic_adar"), F.asc("src"), F.asc("dst"))
        .limit(k)
    )
    # `und` stays persisted: the returned PLAN scans it five times (deg,
    # apex, wedge right side, anti-join, degree join-backs) and there is
    # no internal action here to unpersist after — the cache fills on the
    # caller's first action and turns five symmetrize shuffles into one.
    return out
