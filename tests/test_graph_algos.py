"""CC / LPA / triangle-count exactness (FIXTURES.md §F1 structure goldens
+ networkx oracles on the synthetic source-code graph)."""

from __future__ import annotations

from collections import Counter

import networkx as nx
import pandas as pd
import pytest

from pagerank_project_spark.operators.components import connected_components
from pagerank_project_spark.operators.extract import extract_edges, vertices_from_files
from pagerank_project_spark.operators.labelprop import label_propagation
from pagerank_project_spark.operators.triangles import triangle_count


def edges_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))


def lpa_oracle(vertex_ids, directed_edges, iterations):
    """Sync LPA replica: neighbor label frequency over the symmetrized,
    deduplicated, self-loop-free edge set; tie → min label."""
    adj = {v: set() for v in vertex_ids}
    for s, t in directed_edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    labels = {v: v for v in vertex_ids}
    for _ in range(iterations):
        new = {}
        for v in vertex_ids:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in adj[v])
            # tie-break: max count, then MIN label (string order)
            top = max(cnt.values())
            new[v] = min(lbl for lbl, c in cnt.items() if c == top)
        labels = new
    return labels


# --- F1 small graph ---------------------------------------------------------

def test_small_graph_cc_single_component(spark, small_rows):
    res = connected_components(spark, edges_df(spark, small_rows))
    labs = {r["id"]: r["component"] for r in res.labels.collect()}
    assert res.converged
    assert set(labs.values()) == {"1"}
    assert len(labs) == 6


def test_small_graph_cc_two_components(spark, small_rows):
    rows = [r for r in small_rows if r != ("3", "5")]
    res = connected_components(spark, edges_df(spark, rows))
    labs = {r["id"]: r["component"] for r in res.labels.collect()}
    assert {k for k, v in labs.items() if v == "1"} == {"1", "2", "3"}
    assert {k for k, v in labs.items() if v == "4"} == {"4", "5", "6"}


def test_small_graph_triangles(spark, small_rows):
    res = triangle_count(spark, edges_df(spark, small_rows))
    assert res.total == 2  # {1,2,3} and {4,5,6} (FIXTURES.md §F1)
    pv = {r["id"]: r["triangles"] for r in res.per_vertex.collect()}
    assert pv == {str(i): 1 for i in range(1, 7)}


def test_small_graph_lpa_matches_oracle(spark, small_rows):
    res = label_propagation(spark, edges_df(spark, small_rows), iterations=5)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    exp = lpa_oracle([str(i) for i in range(1, 7)], small_rows, 5)
    assert got == exp


def test_lpa_edge_order_invariance(spark, small_rows):
    import random

    rows = list(small_rows)
    random.Random(3).shuffle(rows)
    a = {r["id"]: r["label"] for r in label_propagation(spark, edges_df(spark, small_rows), iterations=4).labels.collect()}
    b = {r["id"]: r["label"] for r in label_propagation(spark, edges_df(spark, rows), iterations=4).labels.collect()}
    assert a == b


# --- synthetic source-code graph vs networkx --------------------------------

@pytest.fixture(scope="module")
def synth(spark, sf0001_fixture):
    files = spark.read.parquet(f"{sf0001_fixture}/source_table/data")
    edges = extract_edges(files, verify_sha=False).persist()
    verts = vertices_from_files(files)
    epd = edges.select("src", "dst").toPandas()
    vids = [r["id"] for r in verts.distinct().collect()]
    return edges, verts, epd, vids


def test_synthetic_cc_matches_networkx(spark, synth):
    edges, verts, epd, vids = synth
    g = nx.Graph()
    g.add_nodes_from(vids)
    g.add_edges_from(epd.itertuples(index=False))
    exp = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            exp[v] = m
    res = connected_components(spark, edges, vertices=verts)
    got = {r["id"]: r["component"] for r in res.labels.collect()}
    assert res.converged
    assert got == exp
    # multi-component guarantee from the fixture's isolated repo ring
    assert len(set(exp.values())) > 1


def test_synthetic_triangles_match_networkx(spark, synth):
    edges, verts, epd, vids = synth
    g = nx.Graph()
    g.add_edges_from((s, t) for s, t in epd.itertuples(index=False) if s != t)
    nx_tri = nx.triangles(g)
    res = triangle_count(spark, edges)
    assert res.total == sum(nx_tri.values()) // 3
    pv = {r["id"]: r["triangles"] for r in res.per_vertex.collect()}
    assert pv == {v: c for v, c in nx_tri.items() if c > 0}


def test_synthetic_lpa_matches_oracle(spark, synth):
    edges, verts, epd, vids = synth
    res = label_propagation(spark, edges, vertices=verts, iterations=4)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    exp = lpa_oracle(vids, list(epd.itertuples(index=False)), 4)
    assert got == exp


# --- HITS + clustering coefficient (round 3) ---------------------------------

def hits_oracle(vertex_ids, directed_edges, iterations):
    """Numpy replica of operators/hits.py: dedup edges, per iteration one
    auth gather + L2 normalize then one hub gather + L2 normalize."""
    import numpy as np

    ids = sorted(set(vertex_ids))
    idx = {v: i for i, v in enumerate(ids)}
    dedup = {(s, t) for s, t in directed_edges}
    si = np.array([idx[s] for s, _ in dedup], dtype=np.int64)
    ti = np.array([idx[t] for _, t in dedup], dtype=np.int64)
    hub = np.ones(len(ids))
    auth = np.zeros(len(ids))
    for _ in range(iterations):
        auth = np.zeros(len(ids))
        np.add.at(auth, ti, hub[si])
        auth /= np.sqrt((auth ** 2).sum()) or 1.0
        hub = np.zeros(len(ids))
        np.add.at(hub, si, auth[ti])
        hub /= np.sqrt((hub ** 2).sum()) or 1.0
    return {v: (auth[idx[v]], hub[idx[v]]) for v in ids}


def test_hits_small_graph(spark, small_rows):
    from pagerank_project_spark.operators.hits import hits

    res = hits(spark, edges_df(spark, small_rows), iterations=3)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    exp = hits_oracle(
        {v for e in small_rows for v in e}, small_rows, 3
    )
    assert set(got) == set(exp)
    for v in exp:
        assert got[v][0] == pytest.approx(exp[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(exp[v][1], abs=1e-12)


def test_hits_rejects_zero_iterations(spark, small_rows):
    from pagerank_project_spark.operators.hits import hits

    with pytest.raises(ValueError):
        hits(spark, edges_df(spark, small_rows), iterations=0)


def test_synthetic_hits_matches_oracle(spark, synth):
    from pagerank_project_spark.operators.hits import hits

    edges, verts, epd, vids = synth
    res = hits(spark, edges, vertices=verts, iterations=3)
    got = {r["id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    exp = hits_oracle(vids, list(epd.itertuples(index=False)), 3)
    assert set(got) == set(exp)
    for v in exp:
        # fp summation order differs between partitions and the replica
        assert got[v][0] == pytest.approx(exp[v][0], abs=1e-9)
        assert got[v][1] == pytest.approx(exp[v][1], abs=1e-9)


def test_synthetic_clustering_matches_networkx(spark, synth):
    from pagerank_project_spark.operators.triangles import clustering_coefficient

    edges, verts, epd, vids = synth
    g = nx.Graph()
    g.add_edges_from((s, t) for s, t in epd.itertuples(index=False) if s != t)
    exp = nx.clustering(g)
    got = {r["id"]: r["coeff"] for r in clustering_coefficient(spark, edges).collect()}
    assert set(got) == set(exp)  # one row per non-isolated vertex
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)


def test_kcore_known_small_graph(spark):
    from pagerank_project_spark.operators.kcore import kcore

    # 4-clique {a,b,c,d} (coreness 3) with a tail d-e-f (coreness 1)
    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("d", "e"), ("e", "f")]
    res = kcore(spark, edges_df(spark, clique + tail))
    got = {r["id"]: r["core"] for r in res.cores.collect()}
    assert res.converged
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 1, "f": 1}


def test_synthetic_kcore_matches_networkx(spark, synth):
    from pagerank_project_spark.operators.kcore import kcore

    edges, verts, epd, vids = synth
    g = nx.Graph()
    g.add_nodes_from(vids)
    g.add_edges_from((s, t) for s, t in epd.itertuples(index=False) if s != t)
    exp = nx.core_number(g)
    res = kcore(spark, edges, vertices=verts)
    got = {r["id"]: r["core"] for r in res.cores.collect()}
    assert res.converged
    assert got == exp


def test_linkpred_matches_networkx(spark, synth):
    from pagerank_project_spark.operators.linkpred import link_prediction_topk

    edges, verts, epd, vids = synth
    out = link_prediction_topk(spark, edges, k=30).collect()
    assert out, "fixture should yield distance-2 candidates"
    g = nx.Graph()
    g.add_edges_from((s, t) for s, t in epd.itertuples(index=False) if s != t)
    pairs = [(r["src"], r["dst"]) for r in out]
    nx_aa = {(u, v): s for u, v, s in nx.adamic_adar_index(g, pairs)}
    nx_jc = {(u, v): s for u, v, s in nx.jaccard_coefficient(g, pairs)}
    for r in out:
        key = (r["src"], r["dst"])
        assert r["src"] < r["dst"]
        assert not g.has_edge(*key)  # predictions are non-edges
        assert r["adamic_adar"] == pytest.approx(nx_aa[key], abs=1e-6)
        assert r["jaccard"] == pytest.approx(nx_jc[key], abs=1e-6)
        assert r["common"] == len(list(nx.common_neighbors(g, *key)))
    # top-k really is the global maximum AA over ALL candidate pairs
    all_cand = [
        (u, v) for u, v in
        ((min(a, b), max(a, b)) for a in g for b in g if a < b and not g.has_edge(a, b))
        if any(True for _ in nx.common_neighbors(g, u, v))
    ] if g.number_of_nodes() <= 400 else None
    if all_cand is not None:
        best = sorted(
            ((round(s, 6), u, v) for u, v, s in nx.adamic_adar_index(g, all_cand)),
            key=lambda p: (-p[0], p[1], p[2]),
        )[: len(out)]
        got = [(r["adamic_adar"], r["src"], r["dst"]) for r in out]
        assert got == best
