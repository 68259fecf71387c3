"""Connected components — iterative min-label hash propagation.

BASELINE.json north_star: "connected components via iterative min-label
hash propagation", labels must match the oracle EXACTLY. Component label
= lexicographic min vertex id of the component (deterministic, partition-
count and edge-order invariant — ids are strings, min is total).

Per superstep (all shuffle-reduced, map-side combined):

    nbr_min(id) = min over undirected neighbors of their current label
    label'      = least(label, nbr_min)
    changed     = Σ [label' ≠ label]        (same single-action discipline
                                             as the PageRank loop: the
                                             change count is the only
                                             driver round-trip)

Converges in O(diameter) supersteps. For graphs with giant diameters the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves rounds — left as the `two_phase=True`
upgrade path; plain propagation is exact and is what the oracle checks.

Scale: the propagation join shuffles (edges ⋈ labels) on src; the
undirected edge table is materialized once (distinct'd) and persisted with
a pinned partitioning, labels are the only moving |V|-sized state —
identical physics to the PageRank superstep, so the same salting/AQE notes
apply (operators/pagerank.py header).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class ComponentsResult:
    labels: DataFrame  # (id: string, component: string)
    iterations: int
    converged: bool


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Symmetrized, deduplicated, self-loop-free edge table."""
    e = edges.select("src", "dst")
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 200,
    num_partitions: int | None = None,
    local_checkpoint_every: int = 8,
    checkpoint_store=None,
) -> ComponentsResult:
    from pagerank_project_spark.operators.pagerank import build_vertices

    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = build_vertices(edges, vertices)
    und = undirected_edges(edges).repartition(nparts, "src").persist()
    und.count()

    start_iter = 0
    if checkpoint_store is not None and checkpoint_store.latest_iteration() is not None:
        start_iter = checkpoint_store.latest_iteration()
        labels = (
            checkpoint_store.read_state(spark, start_iter)
            .select("id", "component")
            .repartition(nparts, "id")
            .localCheckpoint(eager=True)
        )
    else:
        labels = (
            verts.select("id", F.col("id").alias("component"))
            .repartition(nparts, "id")
            .localCheckpoint(eager=True)
        )
    converged = False
    it = start_iter
    for it in range(start_iter + 1, start_iter + max_iterations + 1):
        nbr_min = (
            und.join(labels, und.src == labels.id, "inner")
            .select(F.col("dst").alias("nid"), "component")
            .groupBy("nid")
            .agg(F.min("component").alias("nbr_min"))
        )
        joined = (
            labels.join(nbr_min, labels.id == F.col("nid"), "left")
            .select(
                "id",
                F.col("component").alias("old"),
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            # localCheckpoint every superstep: materializes AND truncates
            # lineage (plan references previous labels twice → exponential
            # growth otherwise — same failure mode as the PageRank loop)
            .localCheckpoint(eager=True)
        )
        changed = joined.filter(F.col("component") != F.col("old")).count()
        new_labels = joined.select("id", "component")
        if checkpoint_store is not None:
            checkpoint_store.write_iteration(
                new_labels, iteration=it, metrics={"changed_labels": int(changed)}
            )
        labels = new_labels
        if changed == 0:
            converged = True
            break

    und.unpersist()
    return ComponentsResult(labels=labels, iterations=it, converged=converged)
