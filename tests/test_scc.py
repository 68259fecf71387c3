"""Strongly connected components (operators/scc.py) vs networkx."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from pagerank_project_spark.operators.scc import strongly_connected_components

networkx = pytest.importorskip("networkx")


def _nx_labels(edges, extra_vertices=()):
    g = networkx.DiGraph()
    g.add_edges_from(edges)
    g.add_nodes_from(extra_vertices)
    out = {}
    for comp in networkx.strongly_connected_components(g):
        lbl = min(comp)
        for v in comp:
            out[v] = lbl
    return out


def _run(spark, edges, extra_vertices=()):
    e = spark.createDataFrame(edges, "src string, dst string")
    verts = None
    if extra_vertices:
        ids = sorted({x for p in edges for x in p} | set(extra_vertices))
        verts = spark.createDataFrame([(v,) for v in ids], "id string")
    res = strongly_connected_components(spark, e, vertices=verts)
    return {r.id: r.scc for r in res.labels.collect()}, res


def test_scc_two_cycles_and_bridge(spark):
    # cycle {a,b,c} -> bridge -> cycle {x,y}; singleton s hangs off
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "x"), ("x", "y"), ("y", "x"), ("y", "s")]
    got, res = _run(spark, edges)
    assert got == _nx_labels(edges)
    assert res.rounds >= 1


def test_scc_dag_is_all_singletons(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    got, _ = _run(spark, edges)
    assert got == {v: v for v in "abcde"}


def test_scc_path_needs_trim_not_rounds(spark):
    """A 12-vertex path: trim must eat it without blowing max_rounds."""
    edges = [(f"v{i:02d}", f"v{i + 1:02d}") for i in range(11)]
    got, res = _run(spark, edges)
    assert got == _nx_labels(edges)
    assert res.rounds <= 5


def test_scc_deep_path_folds_parts(spark):
    """A 48-vertex path is eaten 2 endpoints per trim pass, appending one
    part per pass — assigned_parts crosses the fold-every-8 threshold in
    _fold_assigned several times before the final union. Guards two
    deep-input regressions at once: the folded union must keep the final
    plan's analysis bounded (a linear 20+-branch unionByName chain pays
    quadratic analysis), and the folded labels must be identical to the
    unfolded semantics (networkx)."""
    import time as _time

    edges = [(f"v{i:02d}", f"v{i + 1:02d}") for i in range(47)]
    t0 = _time.time()
    e = spark.createDataFrame(edges, "src string, dst string")
    res = strongly_connected_components(spark, e, max_rounds=50)
    got = {r.id: r.scc for r in res.labels.collect()}
    wall = _time.time() - t0
    assert got == _nx_labels(edges)
    assert res.rounds <= 25
    # bounded end-to-end: pre-fold, deep runs paid quadratic plan analysis
    # (and pre-stats-fix they stalled for minutes per superstep)
    assert wall < 420, f"deep-path SCC took {wall:.0f}s — analysis blowup?"


def test_scc_isolated_vertices_are_singletons(spark):
    edges = [("a", "b"), ("b", "a")]
    got, _ = _run(spark, edges, extra_vertices=["iso1", "iso2"])
    assert got == _nx_labels(edges, ["iso1", "iso2"])


def test_scc_self_loop_singleton(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a"), ("c", "c")]
    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)


@pytest.mark.parametrize("seed", [11, 42])
def test_scc_random_digraphs_match_networkx(spark, seed):
    rng = random.Random(seed)
    n, m = 60, 150
    edges = list({(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)})
    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)


def test_scc_partition_invariant(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "c")]
    e = spark.createDataFrame(edges, "src string, dst string")
    a = {
        (r.id, r.scc)
        for r in strongly_connected_components(spark, e).labels.collect()
    }
    b = {
        (r.id, r.scc)
        for r in strongly_connected_components(spark, e.repartition(7, "dst")).labels.collect()
    }
    assert a == b == {(v, "a") for v in "abcde"}


def test_condensation_is_acyclic_and_matches_networkx(spark):
    from pagerank_project_spark.operators.scc import condensation

    rng = random.Random(5)
    edges = list({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(90)})
    e = spark.createDataFrame(edges, "src string, dst string")
    res = strongly_connected_components(spark, e)
    cond = {(r.src_scc, r.dst_scc, r.weight) for r in condensation(e, res.labels).collect()}

    lab = _nx_labels(edges)
    exp = {}
    for s, d in edges:
        if lab[s] != lab[d]:
            exp[(lab[s], lab[d])] = exp.get((lab[s], lab[d]), 0) + 1
    assert cond == {(a, b, w) for (a, b), w in exp.items()}

    g = networkx.DiGraph((a, b) for a, b, _ in cond)
    assert networkx.is_directed_acyclic_graph(g)


def test_dag_levels_longest_path(spark):
    from pagerank_project_spark.operators.scc import dag_levels

    # diamond + tail: longest path to e goes a->b->d->e (3), not a->c->e? c->e skips d
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("c", "e")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.id: r.level for r in dag_levels(spark, e).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_dag_levels_isolated_via_vertices_and_cycle_raises(spark):
    from pagerank_project_spark.operators.scc import dag_levels

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    verts = spark.createDataFrame([("a",), ("b",), ("lone",)], "id string")
    got = {r.id: r.level for r in dag_levels(spark, e, vertices=verts).collect()}
    assert got == {"a": 0, "b": 1, "lone": 0}

    cyc = spark.createDataFrame([("x", "y"), ("y", "x")], "src string, dst string")
    with pytest.raises(RuntimeError, match="cycle"):
        dag_levels(spark, cyc, max_iterations=5)


def test_condensation_then_levels_matches_networkx(spark):
    from pagerank_project_spark.operators.scc import condensation, dag_levels

    rng = random.Random(9)
    edges = list({(f"n{rng.randrange(25)}", f"n{rng.randrange(25)}") for _ in range(70)})
    e = spark.createDataFrame(edges, "src string, dst string")
    res = strongly_connected_components(spark, e)
    cond = condensation(e, res.labels).select(
        F.col("src_scc").alias("src"), F.col("dst_scc").alias("dst")
    )
    all_sccs = res.labels.select(F.col("scc").alias("id")).distinct()
    got = {r.id: r.level for r in dag_levels(spark, cond, vertices=all_sccs).collect()}

    lab = _nx_labels(edges)
    g = networkx.DiGraph()
    g.add_nodes_from(set(lab.values()))
    for s, d in edges:
        if lab[s] != lab[d]:
            g.add_edge(lab[s], lab[d])
    exp = {v: 0 for v in g.nodes}
    for v in networkx.topological_sort(g):
        for u in g.predecessors(v):
            exp[v] = max(exp[v], exp[u] + 1)
    assert got == exp
