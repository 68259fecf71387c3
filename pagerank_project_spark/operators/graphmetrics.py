"""Whole-graph structural metrics: modularity, degree assortativity,
reciprocity.

The reference (Pagerank_Project pagerank.py) computes per-vertex scores
only; these are the partition/graph-level companions a link-graph
pipeline reports next to them (community quality for LPA output, hub
mixing for the crawl frontier, reciprocity for spam/nofollow analysis).

Scale design (100 TB discipline shared with the rest of the engine):
- every metric is a fixed chain of hash-partitioned aggregations over
  the edge table — no windows, no sorts, no persists, no driver-side
  actions; each returns ONE lazily-planned 1-row DataFrame;
- label/degree side tables join with an explicit ``shuffle_hash`` hint so
  the |E|-row side streams and only the |V|-row side shuffles (the
  PageRank superstep rule — auto-broadcast of a multi-million-row build
  side is forbidden for the same reason as in operators/pagerank.py);
- every metric reduces to EXACT integer sufficient statistics (degree
  sums, edge counts), with the floating-point closed form applied once
  to the aggregated values — the cross-engine (DuckDB oracle) comparison
  is then deterministic instead of depending on double summation order.
  (Beyond ~10^9 max degree the Σd² terms would need DOUBLE aggs and the
  metric becomes approximate by nature; the exact path is the
  oracle-checkable one.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct self-loop-free canonical pairs (s1 < s2) — each undirected
    edge exactly once (the triangles.py convention)."""
    return (
        edges.select(
            F.least("src", "dst").alias("s1"), F.greatest("src", "dst").alias("s2")
        )
        .filter(F.col("s1") != F.col("s2"))
        .distinct()
    )


def modularity(spark: SparkSession, edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a vertex partition over the undirected simple
    graph: Q = Σ_c [ e_c/m − (d_c/(2m))² ] = Σe_c/m − Σd_c²/(4m²), with m
    undirected edges, e_c intra-community edges, d_c community degree.

    ``labels``: (id, label) — e.g. ``label_propagation(...)``.labels. Must
    cover every edge endpoint; an uncovered endpoint raises AT EXECUTION
    (the guard is folded into the plan — null labels from the left join
    feed an assert_true, prune-proof like pagerank's decode guard).

    Single declarative plan: canonical distinct (one shuffle) → two
    shuffle_hash label joins (labels shuffle, edges stream) → explode each
    edge into its two (label, is_intra) endpoint halves → one map-side-
    combined per-community agg → one O(#communities) final agg. m is
    recovered exactly as Σd_c/2, so no separate count job runs.
    ``n_communities`` counts communities touching ≥1 edge (labels whose
    members are all isolated contribute 0 to Q and are not counted).

    → 1 row (n_edges_und, n_communities, modularity[6dp]).
    """
    und = _canonical_undirected(edges)
    lab = labels.select("id", "label")
    both = und.join(
        lab.select(F.col("id").alias("s1"), F.col("label").alias("_c1")).hint("shuffle_hash"),
        "s1",
        "left",
    ).join(
        lab.select(F.col("id").alias("s2"), F.col("label").alias("_c2")).hint("shuffle_hash"),
        "s2",
        "left",
    )
    intra = (F.col("_c1") == F.col("_c2")).cast("long")
    halves = both.select(
        F.explode(
            F.array(
                F.struct(F.col("_c1").alias("label"), intra.alias("i")),
                F.struct(F.col("_c2").alias("label"), intra.alias("i")),
            )
        ).alias("h")
    ).select("h.label", "h.i")
    per_c = halves.groupBy("label").agg(
        F.count("*").alias("d_c"), F.sum("i").alias("e2_c")
    )
    tot = per_c.agg(
        F.sum(F.when(F.col("label").isNull(), F.col("d_c")).otherwise(0)).alias("n_bad"),
        F.count(F.col("label")).alias("n_communities"),
        F.sum("d_c").alias("sum_d"),  # = 2m when coverage holds
        F.sum("e2_c").alias("sum_e2"),  # = 2·Σe_c
        F.sum(F.col("d_c") * F.col("d_c")).alias("sum_d2"),
    )
    m = F.col("sum_d") / 2  # exact: sum_d is even by construction
    q = (F.col("sum_e2") / 2) / m - F.col("sum_d2") / (F.lit(4.0) * m * m)
    guard = F.assert_true(
        F.col("n_bad") == 0, F.lit("modularity: labels must cover every edge endpoint")
    )
    return tot.select(
        m.cast("long").alias("n_edges_und"),
        F.col("n_communities").cast("long"),
        # + coalesce(guard, 0): assert_true yields NULL on success and raises
        # otherwise — folding it into the value keeps the guard prune-proof
        (F.round(q, 6) + F.coalesce(guard.cast("double"), F.lit(0.0))).alias("modularity"),
    )


def mixing_profile(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Degree assortativity + reciprocity in one lazily-planned pass.

    Assortativity (Newman 2002 r): Pearson correlation of
    (deg(u), deg(v)) over the undirected edge list taken in BOTH
    directions; degrees are undirected simple-graph degrees. The five
    sufficient statistics are exact BIGINT sums; NULL when degenerate
    (all degrees equal → zero variance).

    Reciprocity: |{(u,v) ∈ E_d : (v,u) ∈ E_d}| / |E_d| over the distinct
    self-loop-free DIRECTED edge set — an exact integer ratio.

    → 1 row (n_edges_und, assortativity[6dp], n_edges_directed,
       reciprocity[6dp]).
    """
    und = _canonical_undirected(edges)
    deg = (
        und.select(F.col("s1").alias("id"))
        .unionByName(und.select(F.col("s2").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # both directions so the correlation is symmetric in (x, y)
    sym = und.unionByName(und.select(F.col("s2").alias("s1"), F.col("s1").alias("s2")))
    pairs = sym.join(
        deg.select(F.col("id").alias("s1"), F.col("deg").alias("dx")).hint("shuffle_hash"), "s1"
    ).join(
        deg.select(F.col("id").alias("s2"), F.col("deg").alias("dy")).hint("shuffle_hash"), "s2"
    )
    stats = pairs.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    # reciprocity: one left join of the directed set against its reverse —
    # n_dir and n_recip come out of the same agg (no separate count job)
    ed = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    rec = (
        ed.join(
            ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("_r")),
            ["src", "dst"],
            "left",
        ).agg(
            F.count("*").alias("n_dir"),
            F.sum(F.coalesce(F.col("_r"), F.lit(0))).alias("n_recip"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return stats.crossJoin(rec).select(
        (F.col("n") / 2).cast("long").alias("n_edges_und"),
        F.round(F.when(den != 0, num / den), 6).alias("assortativity"),
        F.col("n_dir").cast("long").alias("n_edges_directed"),
        F.round(F.col("n_recip") / F.col("n_dir").cast("double"), 6).alias("reciprocity"),
    )
