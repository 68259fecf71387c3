"""Round-4 operator breadth: graph metrics (modularity, assortativity,
reciprocity), traversal (multi-source BFS, deterministic random walks),
the quotient-graph collapse, and the LPA packed-argmax superstep A/B."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def edges_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


EDGES = [
    ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d"),
    ("g", "a"), ("a", "g"), ("h", "h"),  # self-loop must drop
    ("b", "c"),  # duplicate must dedup
]


def _nx_graphs():
    import networkx as nx

    gd = nx.DiGraph()
    gd.add_edges_from((s, d) for s, d in EDGES if s != d)
    gu = nx.Graph(gd)
    return gd, gu


# --------------------------------------------------------------------------
# modularity
# --------------------------------------------------------------------------

def test_modularity_matches_networkx(spark):
    import networkx as nx
    from pagerank_project_spark.operators.graphmetrics import modularity

    e = edges_df(spark, EDGES)
    part = {"a": "x", "b": "x", "c": "x", "g": "x", "d": "y", "e": "y", "f": "y", "h": "z"}
    labels = spark.createDataFrame(list(part.items()), "id string, label string")
    row = modularity(spark, e, labels).first()

    _, gu = _nx_graphs()
    comms = [{v for v, c in part.items() if c == k and v in gu} for k in ("x", "y")]
    want = nx.algorithms.community.modularity(gu, comms)
    assert row["n_edges_und"] == gu.number_of_edges()
    assert row["n_communities"] == 2  # 'z' is the isolated self-loop vertex
    assert row["modularity"] == pytest.approx(want, abs=2e-6)


def test_modularity_coverage_guard_raises(spark):
    from pagerank_project_spark.operators.graphmetrics import modularity

    e = edges_df(spark, [("a", "b"), ("b", "c")])
    labels = spark.createDataFrame([("a", "x"), ("b", "x")], "id string, label string")
    with pytest.raises(Exception, match="cover"):
        modularity(spark, e, labels).collect()


# --------------------------------------------------------------------------
# mixing profile (assortativity + reciprocity)
# --------------------------------------------------------------------------

def test_mixing_profile_matches_networkx(spark):
    import networkx as nx
    from pagerank_project_spark.operators.graphmetrics import mixing_profile

    e = edges_df(spark, EDGES)
    row = mixing_profile(spark, e).first()

    gd, gu = _nx_graphs()
    assert row["n_edges_und"] == gu.number_of_edges()
    assert row["assortativity"] == pytest.approx(
        nx.degree_assortativity_coefficient(gu), abs=1e-5
    )
    ed = set(gd.edges())
    recip = sum(1 for (s, d) in ed if (d, s) in ed) / len(ed)
    assert row["n_edges_directed"] == len(ed)
    assert row["reciprocity"] == pytest.approx(recip, abs=1e-6)


def test_mixing_profile_degenerate_assortativity_null(spark):
    """A degree-regular graph has zero degree variance — NULL, not NaN/raise."""
    from pagerank_project_spark.operators.graphmetrics import mixing_profile

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])  # 3-cycle, all deg 2
    row = mixing_profile(spark, e).first()
    assert row["assortativity"] is None
    assert row["reciprocity"] == 0.0


# --------------------------------------------------------------------------
# BFS distances
# --------------------------------------------------------------------------

def test_bfs_distances_matches_networkx(spark):
    import networkx as nx
    from pagerank_project_spark.operators.traversal import bfs_distances

    e = edges_df(spark, EDGES)
    seeds = spark.createDataFrame([("a",), ("e",)], "id string")
    got = {r["id"]: r["dist"] for r in bfs_distances(spark, e, seeds, max_iterations=10).collect()}

    gd, _ = _nx_graphs()
    want = {}
    for s in ("a", "e"):
        for v, d in nx.single_source_shortest_path_length(gd, s).items():
            want[v] = min(want.get(v, 10**9), d)
    assert got == want


def test_bfs_distance_cap(spark):
    from pagerank_project_spark.operators.traversal import bfs_distances

    e = edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["dist"] for r in bfs_distances(spark, e, seeds, max_iterations=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d is beyond the cap


# --------------------------------------------------------------------------
# random walks
# --------------------------------------------------------------------------

def _walk_replica(edges, start, steps):
    adj: dict[str, list[str]] = {}
    for s, d in set(edges):
        if s != d:
            adj.setdefault(s, []).append(d)
    out, cur = [(start, 0, start)], start
    for t in range(1, steps + 1):
        if cur not in adj:
            break
        cur = min(
            adj[cur],
            key=lambda d: (hashlib.md5(f"{start}|{t}|{d}".encode()).hexdigest(), d),
        )
        out.append((start, t, cur))
    return out


def test_random_walks_match_python_replica(spark):
    from pagerank_project_spark.operators.traversal import random_walks

    e = edges_df(spark, EDGES)
    starts = spark.createDataFrame([("a",), ("d",)], "id string")
    got = sorted(
        (r["walk_id"], r["step"], r["id"])
        for r in random_walks(spark, e, starts, steps=4).collect()
    )
    want = sorted(_walk_replica(EDGES, "a", 4) + _walk_replica(EDGES, "d", 4))
    assert got == want


def test_random_walk_stops_at_sink(spark):
    from pagerank_project_spark.operators.traversal import random_walks

    e = edges_df(spark, [("a", "b"), ("b", "c")])  # c is a sink
    starts = spark.createDataFrame([("a",)], "id string")
    rows = random_walks(spark, e, starts, steps=5).collect()
    assert sorted((r["step"], r["id"]) for r in rows) == [(0, "a"), (1, "b"), (2, "c")]


# --------------------------------------------------------------------------
# quotient graph
# --------------------------------------------------------------------------

def test_quotient_graph_collapse(spark):
    from pagerank_project_spark.operators.traversal import quotient_graph

    e = edges_df(
        spark,
        [
            ("r:m0/f0", "r:m1/f0"), ("r:m0/f1", "r:m1/f1"), ("r:m0/f0", "r:m0/f1"),
            ("r:m1/f0", "r:m2/f0"),
        ],
    )
    got = {
        (r["src_group"], r["dst_group"]): r["weight"]
        for r in quotient_graph(e, "regexp_replace({v}, '/[^/]+$', '')").collect()
    }
    # m0→m1 aggregates two file edges; the intra-m0 edge drops
    assert got == {("r:m0", "r:m1"): 2, ("r:m1", "r:m2"): 1}


# --------------------------------------------------------------------------
# LPA packed argmax ≡ window argmax (same winner under forced fallback)
# --------------------------------------------------------------------------

def test_lpa_packed_and_window_paths_agree(spark):
    """Shifting all vids by 2^31 pushes them past the packable range while
    preserving their order, so the run takes the row_number Window path;
    labels decode to the same (id, label) set either way."""
    from pagerank_project_spark.operators.labelprop import label_propagation
    from pagerank_project_spark.operators.pagerank import build_vertices
    from pagerank_project_spark.operators.vids import string_sorted_vids

    e = edges_df(spark, EDGES + [("c", "e"), ("f", "g")])  # tie-heavy
    verts = build_vertices(e, None)
    packed = label_propagation(spark, e, iterations=3)
    vmap_hi = string_sorted_vids(verts, "id", 4).withColumn(
        "vid", F.col("vid") + F.lit(1 << 31)
    )
    windowed = label_propagation(spark, e, iterations=3, vmap=vmap_hi)
    a = sorted((r["id"], r["label"]) for r in packed.labels.collect())
    b = sorted((r["id"], r["label"]) for r in windowed.labels.collect())
    assert a == b
