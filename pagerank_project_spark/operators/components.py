"""Connected components — large-star/small-star contraction + min-label
propagation.

BASELINE.json north_star: "connected components via iterative min-label
hash propagation", labels must match the oracle EXACTLY. Component label
= lexicographic min vertex id of the component (deterministic, partition-
count and edge-order invariant).

Two algorithms over the same substrate:

- ``star`` (default, the convergence/scale path): alternating
  large-star / small-star edge contraction (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14). Each round:

      large-star: for every vertex u with symmetric neighborhood Γ(u),
                  m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      small-star: orient edges (max → min); for every u with smaller
                  neighbor set S(u), m = min(S(u) ∪ {u}); emit (u, m)
                  and (v, m) for v ∈ S(u) \ {m}.

  Both preserve connectivity; the fixed point is a forest of stars whose
  root is the component minimum. Converges in O(log² n) rounds (O(log n)
  observed) vs O(diameter) for plain propagation — the difference between
  ~7 and ~56 supersteps on the sf0.1 fixture, and between feasible and
  unbounded on a 10^12-vertex web graph with giant diameter. Convergence
  test per round: (edge-count, Σ decimal xxhash64(src,dst)) in ONE agg;
  on a stats match, one exact ``exceptAll`` count confirms set equality
  (the checksum alone never declares convergence).

- ``propagation`` (the fixed-iteration/oracle mode): per superstep ONE
  map-side-combined shuffle — neighbor-label rows ∪ own-label rows →
  groupBy(vid).min; the own row carries the old label so the
  changed-count needs no join. Exactly k supersteps of min-label
  propagation ≡ the unrolled SQL oracle (cc_iter5), because…

…vertex ids are dictionary-encoded ONCE to dense longs in STRING-SORTED
order (operators/vids.string_sorted_vids — range exchange + parallel
per-partition sort; no global single-task sort). min over vids is then
EXACTLY min over string ids at every intermediate superstep, so
fixed-iteration results and mid-run checkpoints match a string-space
oracle on ANY graph — not only those that converge within the budget.
The loop itself shuffles only 8-byte keys/labels (strings measured 2×
slower).

Checkpoint state is algorithm-specific (labels for propagation, the
contracted edge set for star); a store written by one algorithm refuses
to resume under the other.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from pagerank_project_spark.operators.vids import string_sorted_vids


@dataclass
class ComponentsResult:
    labels: DataFrame  # (id: string, component: string)
    iterations: int
    converged: bool
    iter_secs: list[float] | None = None  # wall per round (first carries codegen warmup)


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Symmetrized, deduplicated, self-loop-free edge table."""
    e = edges.select("src", "dst")
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """{(v, min(Γ⁺(u))) : v ∈ Γ(u), v > u} over the symmetrized view.

    Physicalization: the per-center minimum is a WINDOW aggregate over
    partitionBy(src) — one exchange + in-partition pass — instead of a
    groupBy + self-join (two exchanges of the full edge multiset; the
    windowed round measured 1.64× faster end-to-end at sf4). NOT dedup'd:
    duplicates are harmless downstream (small-star's window mins ignore
    them and its trailing distinct restores set semantics) and the output
    is ≤ |sym| rows regardless."""
    from pyspark.sql import Window

    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    t = sym.withColumn("mv", F.min("dst").over(Window.partitionBy("src")))
    m = F.least(F.col("src"), F.col("mv"))
    return t.filter(F.col("dst") > F.col("src")).select(F.col("dst").alias("src"), m.alias("dst"))


def _small_star(e: DataFrame) -> DataFrame:
    """Orient (max→min); per center u emit (u, m) and (v, m) for
    v ∈ S(u) \\ {m}, m = min(S(u)).

    Same window physicalization: min and a row_number (to emit the one
    (u, m) row per center) share one partitionBy(u) exchange; both output
    shapes are produced from a single array-explode projection."""
    from pyspark.sql import Window

    ori = e.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    t = ori.withColumn("m", F.min("v").over(Window.partitionBy("u"))).withColumn(
        "rn", F.row_number().over(Window.partitionBy("u").orderBy("v"))
    )
    pairs = F.array(
        F.when(F.col("v") != F.col("m"), F.struct(F.col("v").alias("s"), F.col("m").alias("d"))),
        F.when(F.col("rn") == 1, F.struct(F.col("u").alias("s"), F.col("m").alias("d"))),
    )
    return (
        t.select(F.explode(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.s").alias("src"), F.col("p.d").alias("dst"))
        .distinct()
    )


def _edge_stats(e: DataFrame) -> tuple[int, object]:
    """(count, exact decimal Σ xxhash64(src,dst)) in one agg — the cheap
    per-round fingerprint. Decimal sum: exact, no ANSI int64 overflow."""
    row = e.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("chk"),
    ).first()
    return row["n"], row["chk"]


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 200,
    num_partitions: int | None = None,
    local_checkpoint_every: int = 8,  # kept for API compat; truncation is per-iteration
    checkpoint_store=None,
    algorithm: str = "star",  # star (contraction, default) | propagation (fixed-iteration oracle)
    validate_vertices: bool = True,
) -> ComponentsResult:
    from pagerank_project_spark.operators.pagerank import build_vertices
    from pagerank_project_spark.operators.vids import assert_endpoints_covered

    if algorithm not in ("star", "propagation"):
        raise ValueError(f"unknown algorithm {algorithm!r}; one of ['star', 'propagation']")
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    verts = build_vertices(edges, vertices)
    if vertices is not None and validate_vertices:
        assert_endpoints_covered(edges, verts)

    # string-sorted dense vids: min-vid ≡ min-string at every superstep
    vmap = string_sorted_vids(verts, "id", nparts)
    und_str = undirected_edges(edges)
    und = (
        und_str.join(vmap.select(F.col("id").alias("src"), F.col("vid").alias("_s")), "src")
        .join(vmap.select(F.col("id").alias("dst"), F.col("vid").alias("_t")), "dst")
        .select(F.col("_s").alias("src"), F.col("_t").alias("dst"))
        .repartition(nparts, "src")
        .persist()
    )
    und.count()

    stored_algo = None
    start_iter = 0
    if checkpoint_store is not None and checkpoint_store.latest_iteration() is not None:
        start_iter = checkpoint_store.latest_iteration()
        stored_algo = checkpoint_store.metrics()[start_iter].get("algorithm", "propagation")
        if stored_algo != algorithm:
            raise ValueError(
                f"checkpoint store holds {stored_algo!r} state; cannot resume with algorithm={algorithm!r}"
            )

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if algorithm == "star":
            labels, it, converged, iter_secs = _run_star(
                spark, und, vmap, nparts, max_iterations, checkpoint_store, start_iter
            )
        else:
            labels, it, converged, iter_secs = _run_propagation(
                spark, und, vmap, nparts, max_iterations, checkpoint_store, start_iter
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)

    und.unpersist()
    return ComponentsResult(labels=labels, iterations=it, converged=converged, iter_secs=iter_secs)


def _run_star(spark, und, vmap, nparts, max_iterations, checkpoint_store, start_iter):
    if start_iter:
        # state = the contracted edge set, stored as string pairs
        st = checkpoint_store.read_state(spark, start_iter)
        e = (
            st.join(vmap.select(F.col("id"), F.col("vid").alias("_s")), "id")
            .join(vmap.select(F.col("id").alias("component"), F.col("vid").alias("_t")), "component")
            .select(F.col("_s").alias("src"), F.col("_t").alias("dst"))
        )
    else:
        e = und.filter(F.col("src") > F.col("dst"))  # canonical max→min orientation
    e = e.repartition(nparts, "src").localCheckpoint(eager=False)
    stats = _edge_stats(e)  # materializes the initial state

    import time

    converged = False
    iter_secs: list[float] = []
    it = start_iter
    for it in range(start_iter + 1, start_iter + max_iterations + 1):
        t_it = time.time()
        # no explicit repartition: the trailing distinct already hash-
        # partitions on (src, dst), and next round's groupBys re-key by
        # src anyway — an extra full-edge exchange per round buys nothing
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        stats2 = _edge_stats(e2)  # the ONE materializing action per round
        iter_secs.append(round(time.time() - t_it, 3))
        if stats2 == stats and e2.exceptAll(e).count() == 0:
            # fingerprint matched AND exact set equality confirmed
            e = e2
            converged = True
            if checkpoint_store is not None:
                checkpoint_store.write_iteration(
                    _decode_edges(e, vmap), iteration=it,
                    metrics={"algorithm": "star", "n_edges": stats2[0], "converged": True},
                )
            break
        e, stats = e2, stats2
        if checkpoint_store is not None:
            checkpoint_store.write_iteration(
                _decode_edges(e, vmap), iteration=it,
                metrics={"algorithm": "star", "n_edges": stats2[0], "converged": False},
            )

    # fixed point = stars (child → component-min root); roots/isolated keep self
    labels = (
        vmap.select("vid")
        .join(e.groupBy("src").agg(F.min("dst").alias("_root")), vmap.vid == F.col("src"), "left")
        .select("vid", F.coalesce(F.col("_root"), F.col("vid")).alias("lbl"))
    )
    return _decode(labels, vmap), it, converged, iter_secs


def _run_propagation(spark, und, vmap, nparts, max_iterations, checkpoint_store, start_iter):
    if start_iter:
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

    import time

    converged = False
    iter_secs: list[float] = []
    it = start_iter
    for it in range(start_iter + 1, start_iter + max_iterations + 1):
        t_it = time.time()
        # ONE shuffle: neighbor-label rows ∪ own rows → groupBy(vid).min.
        # own rows carry the previous label in the `old` slot (neighbor rows
        # carry NULL there — min ignores nulls), so `changed` needs no join.
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
        iter_secs.append(round(time.time() - t_it, 3))
        labels = new_labels.select("vid", "lbl")
        if checkpoint_store is not None:
            checkpoint_store.write_iteration(
                _decode(labels, vmap), iteration=it,
                metrics={"algorithm": "propagation", "changed_labels": int(changed)},
            )
        if changed == 0:
            converged = True
            break
    return _decode(labels, vmap), it, converged, iter_secs


def _decode(labels: DataFrame, vmap: DataFrame) -> DataFrame:
    """(vid, lbl) → (id, component). vids are string-sorted, so the min-vid
    label IS the lexicographic-min string id — a direct two-join decode."""
    return (
        labels.join(vmap.select("vid", "id"), "vid")
        .join(vmap.select(F.col("vid").alias("lbl"), F.col("id").alias("component")), "lbl")
        .select("id", "component")
    )


def _decode_edges(e: DataFrame, vmap: DataFrame) -> DataFrame:
    """Star-mode checkpoint state: the contracted edge set as string pairs
    (column names match the labels shape so the store stays uniform)."""
    return (
        e.join(vmap.select(F.col("vid").alias("src"), F.col("id")), "src")
        .join(vmap.select(F.col("vid").alias("dst"), F.col("id").alias("component")), "dst")
        .select("id", "component")
    )
