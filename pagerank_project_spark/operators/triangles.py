"""Triangle counting by degree-ordered edge orientation.

BASELINE.json north_star: "triangle counting by degree-ordered edge
orientation". The classic MapReduce-friendly algorithm (Cohen; Suri &
Vassilvitskii "Counting Triangles and the Curse of the Last Reducer"):

1. symmetrize + dedup the edge table; compute undirected degrees;
2. orient every undirected edge from the endpoint with the smaller
   (degree, id) pair to the larger — every wedge is now generated at its
   lowest-degree apex, bounding per-vertex wedge fan-out by O(√m) and
   killing the high-degree-hub quadratic blowup;
3. wedges = oriented ⋈ oriented on the shared apex (a→b, a→c with
   (deg,id)(b) < (deg,id)(c));
4. a triangle exists iff the closing oriented edge b→c exists — an
   equi-join against the oriented edge table;
5. per-vertex counts: each closed triangle credits all three corners.

All joins are equi-joins on vertex keys → shuffle-hash/SMJ with AQE; the
oriented table is built once and reused on both sides of the wedge join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from pagerank_project_spark.operators.components import undirected_edges


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (id: string, triangles: long) — zero rows for triangle-free vertices


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected edges oriented low→high by (degree, id). Output
    (src, dst) plus the dst ordering key for the wedge filter."""
    und = undirected_edges(edges)  # both directions present
    deg = und.groupBy("src").agg(F.count("*").alias("deg")).select(
        F.col("src").alias("v"), "deg"
    )
    e = (
        und.join(deg.withColumnRenamed("v", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "ddeg"), "dst")
        # keep each undirected edge once, in (deg, id) increasing direction
        .filter(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "ddeg")
    )
    return e


def triangle_count(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
) -> TriangleResult:
    o = _oriented(edges).persist()
    o.count()

    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("ddeg").alias("bdeg"))
    e2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("ddeg").alias("cdeg"))
    wedges = e1.join(e2, "a").filter(
        (F.col("bdeg") < F.col("cdeg")) | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"], "inner").select("a", "b", "c").persist()

    total = tris.count()
    per_vertex = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    o.unpersist()
    return TriangleResult(total=total, per_vertex=per_vertex)


def clustering_coefficient(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the symmetrized graph:
    coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, else 0, one row
    per NON-ISOLATED vertex (deg over distinct neighbors, self-loops
    dropped — `undirected_edges` semantics, same as the triangle count).

    Exactly the triangle pipeline plus one degree groupBy and a left join;
    the arithmetic is a single exact-integer-ratio division in float64, so
    results are bit-deterministic (no summation-order sensitivity) and
    DuckDB reproduces them bitwise (__spark_entry__ `clustering_coeff`)."""
    tr = triangle_count(spark, edges)
    deg = (
        undirected_edges(edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
    )
    return deg.join(tr.per_vertex, "id", "left").select(
        "id",
        F.when(
            F.col("d") >= 2,
            2.0 * F.coalesce(F.col("triangles"), F.lit(0)) / (F.col("d") * (F.col("d") - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )
