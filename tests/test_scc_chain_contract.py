"""Degree-1 chain contraction (operators/scc.py contract_degree1_chains +
strongly_connected_components(chain_contract=True)) — the round-5 SCC
depth lever. Labels must be IDENTICAL to the uncontracted run (and to
networkx); the contracted graph must actually shrink the reachability
depth (the deep-path/deep-cycle cases would otherwise crawl)."""

from __future__ import annotations

import random

import pytest

from pagerank_project_spark.operators.scc import (
    contract_degree1_chains,
    strongly_connected_components,
)

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


def _run(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src string, dst string")
    res = strongly_connected_components(spark, e, chain_contract=True, **kw)
    return {r.id: r.scc for r in res.labels.collect()}, res


def test_contract_pure_path(spark):
    # a -> b -> c -> d -> e: chain set {b, c, d}; one (a, e) edge remains
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    e = spark.createDataFrame(edges, "src string, dst string").distinct().persist()
    contracted, anchored, cycles, n_chain = contract_degree1_chains(spark, e)
    assert n_chain == 3
    assert {(r.src, r.dst) for r in contracted.collect()} == {("a", "e")}
    assert {(r.id, r.entry, r.exit) for r in anchored.collect()} == {
        ("b", "a", "e"),
        ("c", "a", "e"),
        ("d", "a", "e"),
    }
    assert cycles.count() == 0
    e.unpersist()


def test_contract_pure_cycle(spark):
    # every vertex is deg-1/1 and the walk never exits: one SCC, min id
    edges = [("c", "a"), ("a", "b"), ("b", "c")]
    e = spark.createDataFrame(edges, "src string, dst string").distinct().persist()
    contracted, anchored, cycles, n_chain = contract_degree1_chains(spark, e)
    assert n_chain == 3
    assert contracted.count() == 0
    assert anchored.count() == 0
    assert {(r.id, r.scc) for r in cycles.collect()} == {
        ("a", "a"),
        ("b", "a"),
        ("c", "a"),
    }
    e.unpersist()


def test_contract_chain_closing_on_anchor(spark):
    # a -> b -> c -> a plus a -> x: a has out-degree 2 so the chain {b, c}
    # anchors on a at BOTH ends (entry == exit) and its contracted edge
    # is the dropped self-pair (a, a); expansion must still merge b, c
    # into SCC(a)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "x")]
    e = spark.createDataFrame(edges, "src string, dst string").distinct().persist()
    contracted, anchored, cycles, n_chain = contract_degree1_chains(spark, e)
    assert n_chain == 2
    assert {(r.src, r.dst) for r in contracted.collect()} == {("a", "x")}
    assert {(r.id, r.entry, r.exit) for r in anchored.collect()} == {
        ("b", "a", "a"),
        ("c", "a", "a"),
    }
    assert cycles.count() == 0
    e.unpersist()

    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)  # {a,b,c} one SCC labelled 'a', x singleton


def test_chain_vertex_can_undercut_group_root(spark):
    # SCC {z5, a0, z9} where a0 is chain-interior: the contracted run
    # labels the group min(z5, z9) = z5, and the expansion's relabel must
    # pull it down to the true min member a0
    edges = [("z5", "a0"), ("a0", "z9"), ("z9", "z5"), ("z5", "q"), ("q", "z9")]
    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)
    assert got["z5"] == "a0"


def test_deep_path_contracts_to_one_round(spark):
    # a 400-vertex path would need ~200 trim passes / coloring sub-steps;
    # contraction removes the whole interior before the loop starts
    edges = [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(399)]
    got, res = _run(spark, edges, max_rounds=3, trim_passes=2)
    assert got == _nx_labels(edges)
    assert res.rounds <= 2
    assert res.coloring_supersteps + res.bfs_supersteps <= 20


def test_deep_cycle_contracts_without_loop(spark):
    # a 300-cycle is all chain vertices — the loop body never runs
    n = 300
    edges = [(f"c{i:03d}", f"c{(i + 1) % n:03d}") for i in range(n)]
    got, res = _run(spark, edges, max_rounds=3)
    assert got == {f"c{i:03d}": "c000" for i in range(n)}
    assert res.rounds == 0


def test_two_parallel_chains_dedupe(spark):
    # u -> a1 -> w and u -> b1 -> b2 -> w: both collapse to the SAME
    # (u, w) edge; no cycle, so all chain vertices are singletons
    edges = [("u", "a1"), ("a1", "w"), ("u", "b1"), ("b1", "b2"), ("b2", "w")]
    e = spark.createDataFrame(edges, "src string, dst string").distinct().persist()
    contracted, anchored, cycles, n_chain = contract_degree1_chains(spark, e)
    assert n_chain == 3
    assert {(r.src, r.dst) for r in contracted.collect()} == {("u", "w")}
    e.unpersist()
    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)


def test_chain_on_cycle_through_anchors(spark):
    # u -> c1 -> c2 -> w and w -> u directly: scc(entry) == scc(exit) in
    # the contracted graph, so the chain joins the big SCC
    edges = [("u", "c1"), ("c1", "c2"), ("c2", "w"), ("w", "u"), ("u", "t"), ("s", "w")]
    got, _ = _run(spark, edges)
    assert got == _nx_labels(edges)


@pytest.mark.parametrize("seed", [7, 23, 77])
def test_random_digraphs_contracted_equals_plain_and_networkx(spark, seed):
    rng = random.Random(seed)
    n, m = 70, 120  # sparse enough that deg-1/1 chains actually occur
    edges = list({(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(m)})
    edges = [(s, d) for s, d in edges if s != d]
    e = spark.createDataFrame(edges, "src string, dst string")
    plain = {
        (r.id, r.scc)
        for r in strongly_connected_components(spark, e).labels.collect()
    }
    contracted = {
        (r.id, r.scc)
        for r in strongly_connected_components(
            spark, e, chain_contract=True
        ).labels.collect()
    }
    assert contracted == plain
    assert dict(contracted) == _nx_labels(edges)


def test_no_chains_is_identity_passthrough(spark):
    # complete-ish digraph: no deg-1/1 vertex; contraction is a no-op
    edges = [(a, b) for a in "abc" for b in "abc" if a != b]
    e = spark.createDataFrame(edges, "src string, dst string").distinct().persist()
    contracted, anchored, cycles, n_chain = contract_degree1_chains(spark, e)
    assert n_chain == 0 and anchored is None and cycles is None
    assert contracted is e
    e.unpersist()
    got, _ = _run(spark, edges)
    assert got == {v: "a" for v in "abc"}
