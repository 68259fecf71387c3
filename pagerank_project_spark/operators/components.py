"""Connected components — iterative min-label hash propagation.

BASELINE.json north_star: "connected components via iterative min-label
hash propagation", labels must match the oracle EXACTLY. Component label
= lexicographic min vertex id of the component (deterministic, partition-
count and edge-order invariant).

Physical design (mirrors the PageRank superstep, operators/pagerank.py):

- vertex ids are dictionary-encoded to longs once; iteration state and
  edges shuffle 8-byte keys/labels (strings measured 2× slower). The
  final component representative is restored EXACTLY as the lexicographic
  min string id by a one-time post-convergence relabel (min-vid and
  min-string orders differ; convergence itself is order-independent —
  propagation of ANY total-order minimum reaches the same fixed point
  partition of vertices).
- each superstep is ONE map-side-combined shuffle: neighbor-label rows
  UNION own-label rows → groupBy(vid).min. The own row carries the old
  label through a second min over (old-slot) so the changed-count needs no
  join.
- ONE action per superstep: a lazily local-checkpointed agg that
  materializes the state, truncates lineage (plan would otherwise double
  per iteration), and returns the changed-label count.

Converges in O(diameter) supersteps. For giant diameters the large-star/
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond") is the upgrade path; plain propagation is exact
and is what the oracle checks.
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
    local_checkpoint_every: int = 8,  # kept for API compat; truncation is per-iteration
    checkpoint_store=None,
) -> ComponentsResult:
    from pagerank_project_spark.operators.pagerank import build_vertices

    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = build_vertices(edges, vertices)

    # dictionary encoding: string id → long vid (one-time). xxhash64 is
    # deterministic under partition recompute (monotonically_increasing_id
    # is not — silent corruption after executor loss); collision → sorted
    # row_number fallback (see operators/pagerank.py).
    vmap = verts.withColumn("vid", F.xxhash64("id")).repartition(nparts, "id").persist()
    counts = vmap.agg(F.count("*").alias("n"), F.count_distinct("vid").alias("nv")).first()
    if counts["nv"] != counts["n"]:
        from pyspark.sql import Window

        vmap.unpersist()
        vmap = (
            verts.withColumn("vid", F.row_number().over(Window.orderBy("id")).cast("long"))
            .repartition(nparts, "id")
            .persist()
        )
        vmap.count()
    und_str = undirected_edges(edges)
    und = (
        und_str.join(vmap.select(F.col("id").alias("src"), F.col("vid").alias("_s")), "src")
        .join(vmap.select(F.col("id").alias("dst"), F.col("vid").alias("_t")), "dst")
        .select(F.col("_s").alias("src"), F.col("_t").alias("dst"))
        .repartition(nparts, "src")
        .persist()
    )
    und.count()

    start_iter = 0
    if checkpoint_store is not None and checkpoint_store.latest_iteration() is not None:
        start_iter = checkpoint_store.latest_iteration()
        # checkpointed labels carry string ids/components → re-encode both
        st = checkpoint_store.read_state(spark, start_iter)
        labels = (
            st.join(vmap.select("id", "vid"), "id")
            .join(
                vmap.select(F.col("id").alias("component"), F.col("vid").alias("lbl")),
                "component",
            )
            .select("vid", "lbl")
        )
    else:
        labels = vmap.select("vid", F.col("vid").alias("lbl"))
    labels = labels.repartition(nparts, "vid").localCheckpoint(eager=False)

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    converged = False
    it = start_iter
    for it in range(start_iter + 1, start_iter + max_iterations + 1):
        # ONE shuffle: neighbor-label rows ∪ own rows → groupBy(vid).min.
        # own rows carry the previous label in the `old` slot (neighbor rows
        # carry NULL there — min ignores nulls; labels are arbitrary signed
        # hashes, so no +inf sentinel exists), so `changed` needs no join.
        nbr = (
            und.join(labels.select(F.col("vid").alias("_sv"), "lbl"), und.src == F.col("_sv"))
            .select(F.col("dst").alias("vid"), "lbl", F.lit(None).cast("long").alias("old"))
        )
        own = labels.select("vid", "lbl", F.col("lbl").alias("old"))
        new_labels = (
            nbr.unionByName(own)
            .groupBy("vid")
            .agg(F.min("lbl").alias("lbl"), F.min("old").alias("old"))
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("lbl") != F.col("old")).count()
        labels = new_labels.select("vid", "lbl")
        if checkpoint_store is not None:
            checkpoint_store.write_iteration(
                _decode(labels, vmap), iteration=it, metrics={"changed_labels": int(changed)}
            )
        if changed == 0:
            converged = True
            break

    out = _decode(labels, vmap)
    spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    und.unpersist()
    return ComponentsResult(labels=out, iterations=it, converged=converged)


def _decode(labels: DataFrame, vmap: DataFrame) -> DataFrame:
    """(vid, lbl) → (id, component) with component = lexicographic MIN
    string id of the component (oracle-exact), via a one-time relabel:
    the per-component min-vid partition is identical to the min-string
    partition; only the representative name changes."""
    with_id = labels.join(vmap.select("vid", "id"), "vid").select("id", "lbl")
    canon = with_id.groupBy("lbl").agg(F.min("id").alias("component"))
    return with_id.join(canon, "lbl").select("id", "component")
