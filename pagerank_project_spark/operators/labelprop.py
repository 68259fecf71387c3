"""Label-propagation community detection (synchronous, deterministic).

BASELINE.json north_star: "label propagation community detection" with
labels matching the oracle EXACTLY. Classic async LPA is order-dependent;
for exact-match determinism this is the SYNCHRONOUS variant with a total
tie-break order, so the result is invariant to partition count and edge
order (SURVEY.md §7 hard-part 3):

    per iteration, every vertex adopts the label that is most frequent
    among its undirected multiset of neighbors (parallel edges count once
    per direction-collapsed edge); ties → smallest label (string order);
    isolated vertices keep their label; fixed iteration count K (sync LPA
    need not converge — it can 2-cycle on bipartite structures).

Physical: neighbor-label frequency = (edges ⋈ labels) → groupBy(dst,
label).count; argmax via row_number over Window(partitionBy dst, orderBy
count desc, label asc) — one shuffle per superstep on the edge table's
src key plus one |V|-sized window, map-side combined.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pagerank_project_spark.operators.components import undirected_edges


@dataclass
class LPAResult:
    labels: DataFrame  # (id: string, label: string)
    iterations: int


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iterations: int = 10,
    num_partitions: int | None = None,
    local_checkpoint_every: int = 8,
    checkpoint_store=None,
) -> LPAResult:
    from pagerank_project_spark.operators.pagerank import build_vertices

    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = build_vertices(edges, vertices)
    und = undirected_edges(edges).repartition(nparts, "src").persist()
    und.count()

    labels = verts.select("id", F.col("id").alias("label")).repartition(nparts, "id").localCheckpoint(eager=True)
    w = Window.partitionBy("nid").orderBy(F.desc("cnt"), F.asc("label"))
    for it in range(1, iterations + 1):
        freq = (
            und.join(labels, und.src == labels.id, "inner")
            .select(F.col("dst").alias("nid"), "label")
            .groupBy("nid", "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = freq.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).select(
            "nid", F.col("label").alias("new_label")
        )
        # lineage truncated every superstep (plan doubles otherwise)
        new_labels = (
            labels.join(best, labels.id == F.col("nid"), "left")
            .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        if checkpoint_store is not None:
            checkpoint_store.write_iteration(new_labels, iteration=it, metrics={})
        labels = new_labels

    und.unpersist()
    return LPAResult(labels=labels, iterations=iterations)
