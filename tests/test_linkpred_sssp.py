"""Link prediction (graph.link_prediction) and weighted shortest paths
(graph.shortest_paths) — hand-checked small graphs + a pure-Python
Dijkstra cross-check."""

import heapq
import math

import pytest

from dug_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# ---------------------------------------------------------------- link pred


@pytest.fixture(scope="module")
def square(spark):
    # 4-cycle a-b-c-d-a: the two diagonals (a,c) and (b,d) each share
    # exactly the two opposite corners as common neighbors.
    return _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])


def test_square_diagonals(square):
    rows = {
        (r["src"], r["dst"]): r for r in graph.link_prediction(square).collect()
    }
    assert set(rows) == {("a", "c"), ("b", "d")}
    ac = rows[("a", "c")]
    assert ac["common_neighbors"] == 2
    # deg(a)=deg(c)=2, union = 2+2-2
    assert ac["jaccard"] == pytest.approx(1.0)
    assert ac["adamic_adar"] == pytest.approx(2.0 / math.log(2.0))


def test_existing_edges_excluded(square):
    got = {(r["src"], r["dst"]) for r in graph.link_prediction(square).collect()}
    for s, d in [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]:
        assert (s, d) not in got and (d, s) not in got


def test_reverse_and_duplicate_edges_collapse(spark):
    df = _edges(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")])
    rows = {(r["src"], r["dst"]): r for r in graph.link_prediction(df).collect()}
    assert set(rows) == {("a", "c")}
    assert rows[("a", "c")]["common_neighbors"] == 1
    # deg(a)=deg(c)=1 → jaccard = 1/(1+1-1)
    assert rows[("a", "c")]["jaccard"] == pytest.approx(1.0)


def test_max_degree_drops_hub_wedges(spark):
    # star center h (deg 4) with leaves l1..l4, plus a wedge l1-m-l2:
    # capping deg ≤ 2 removes h as a wedge MIDDLE — (l1,l2) then scores
    # through m alone, and leaf-only pairs like (l3,l4) vanish.  h still
    # scores as an ENDPOINT: (h,m) via l1 and l2 (both deg 2).
    pairs = [("h", f"l{i}") for i in range(1, 5)] + [("l1", "m"), ("m", "l2")]
    df = _edges(spark, pairs)
    uncapped = {
        (r["src"], r["dst"]): r["common_neighbors"]
        for r in graph.link_prediction(df).collect()
    }
    assert uncapped[("l1", "l2")] == 2  # through h and m
    assert uncapped[("l3", "l4")] == 1  # through h only
    capped = {
        (r["src"], r["dst"]): r for r in graph.link_prediction(df, max_degree=2).collect()
    }
    assert set(capped) == {("l1", "l2"), ("h", "m")}
    assert capped[("l1", "l2")]["common_neighbors"] == 1
    assert capped[("l1", "l2")]["adamic_adar"] == pytest.approx(1.0 / math.log(2.0))
    assert capped[("h", "m")]["common_neighbors"] == 2


def test_self_loops_ignored(spark):
    df = _edges(spark, [("a", "a"), ("a", "b"), ("b", "c")])
    rows = {(r["src"], r["dst"]) for r in graph.link_prediction(df).collect()}
    assert rows == {("a", "c")}


# ---------------------------------------------------------------- sssp


def _wedges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight double")


def _dijkstra(rows, seed):
    adj = {}
    for s, d, w in rows:
        adj.setdefault(s, []).append((d, w))
    dist, pq = {seed: 0.0}, [(0.0, seed)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, math.inf):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, math.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_weighted_beats_fewer_hops(spark):
    # a->b->c total 2.0 beats the direct a->c at 5.0
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0)]
    seeds = spark.createDataFrame([("a",)], "seed string")
    got = {
        r["node"]: r["dist"]
        for r in graph.shortest_paths(_wedges(spark, rows), seeds).collect()
    }
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}


def test_matches_dijkstra_on_dense_graph(spark):
    # deterministic weighted digraph on 8 nodes
    nodes = [f"n{i}" for i in range(8)]
    rows = []
    for i in range(8):
        for j in range(8):
            if i != j and (i * 7 + j * 3) % 4 == 0:
                rows.append((nodes[i], nodes[j], float((i * 5 + j * 11) % 9 + 1)))
    seeds = spark.createDataFrame([("n0",), ("n3",)], "seed string")
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in graph.shortest_paths(_wedges(spark, rows), seeds, iterations=10).collect()
    }
    want = {}
    for s in ["n0", "n3"]:
        for node, d in _dijkstra(rows, s).items():
            want[(s, node)] = d
    assert got == want


def test_iteration_bound_truncates(spark):
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)]
    seeds = spark.createDataFrame([("a",)], "seed string")
    got = {
        r["node"]: r["dist"]
        for r in graph.shortest_paths(_wedges(spark, rows), seeds, iterations=2).collect()
    }
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}  # d needs a 3rd relaxation


def test_early_exit_on_convergence(spark):
    rows = [("a", "b", 1.0)]
    seeds = spark.createDataFrame([("a",)], "seed string")
    # iterations far beyond diameter — converges and exits, same result
    got = {
        r["node"]: r["dist"]
        for r in graph.shortest_paths(_wedges(spark, rows), seeds, iterations=50).collect()
    }
    assert got == {"a": 0.0, "b": 1.0}


def test_unreachable_absent_and_disconnected_seeds(spark):
    rows = [("a", "b", 2.0), ("x", "y", 1.0)]
    seeds = spark.createDataFrame([("a",), ("x",)], "seed string")
    got = {
        (r["seed"], r["node"]): r["dist"]
        for r in graph.shortest_paths(_wedges(spark, rows), seeds).collect()
    }
    assert got == {
        ("a", "a"): 0.0,
        ("a", "b"): 2.0,
        ("x", "x"): 0.0,
        ("x", "y"): 1.0,
    }
