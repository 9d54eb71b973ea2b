"""Deterministic random walks (operators/graph.random_walks)."""

import pytest

from dug_spark.functions import pyoracle as po
from dug_spark.operators import graph


@pytest.fixture(scope="module")
def small(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    return pairs, spark.createDataFrame(pairs, "src string, dst string")


def test_matches_python_mirror(small):
    pairs, df = small
    got = sorted(map(tuple, graph.random_walks(df, walk_length=4, walks_per_node=2).collect()))
    want = sorted(po.random_walk_rows(pairs, 4, 2))
    assert got == want


def test_sink_stops_early(small):
    pairs, df = small
    rows = {(r["start"], r["walk_no"]): r for r in graph.random_walks(df, walk_length=4, walks_per_node=2).collect()}
    # d's only neighbor is the sink e: every walk from d is d>e, 1 step
    assert rows[("d", 0)]["path"] == "d>e" and rows[("d", 0)]["steps"] == 1
    # e has no out-edges, so no walks start there
    assert not any(s == "e" for s, _ in rows)


def test_walk_count_and_validity(small):
    pairs, df = small
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    rows = graph.random_walks(df, walk_length=3, walks_per_node=3).collect()
    assert len(rows) == len(adj) * 3  # one row per (start with out-edges, walk_no)
    for r in rows:
        hops = r["path"].split(">")
        assert hops[0] == r["start"] and len(hops) == r["steps"] + 1
        for u, v in zip(hops, hops[1:]):
            assert v in adj[u], f"non-edge hop {u}->{v}"


def test_walks_diverge_across_walk_no(small):
    """Different walk_no from the same start must be able to take
    different first steps (the hash context includes walk_no)."""
    pairs, df = small
    rows = {(r["start"], r["walk_no"]): r["path"] for r in graph.random_walks(df, walk_length=4, walks_per_node=2).collect()}
    assert rows[("a", 0)] != rows[("a", 1)]


def test_symmetric_mode(spark):
    # a-b undirected: walks bounce between them for the full length
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    rows = graph.random_walks(df, walk_length=3, walks_per_node=1, symmetric=True).collect()
    paths = {r["start"]: r["path"] for r in rows}
    assert paths == {"a": "a>b>a>b", "b": "b>a>b>a"}


def test_skipgrams_match_mirror(small):
    pairs, df = small
    walks = graph.random_walks(df, walk_length=4, walks_per_node=2)
    got = sorted(map(tuple, graph.walks_to_skipgrams(walks, window=2).collect()))
    want = po.skipgram_rows(po.random_walk_rows(pairs, 4, 2), window=2)
    assert got == want


def test_skipgram_window_semantics(spark):
    w = spark.createDataFrame([("a", 0, "a>b>c>d", 3)],
                              "start string, walk_no int, path string, steps int")
    rows = {(r["center"], r["context"]): r["n_pairs"]
            for r in graph.walks_to_skipgrams(w, window=1).collect()}
    # window=1: only adjacent ordered pairs, each once
    assert rows == {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
                    ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1}


def test_skipgram_counts_aggregate_repeats(spark):
    w = spark.createDataFrame(
        [("a", 0, "a>b", 1), ("a", 1, "a>b", 1)],
        "start string, walk_no int, path string, steps int")
    rows = {(r["center"], r["context"]): r["n_pairs"]
            for r in graph.walks_to_skipgrams(w, window=2).collect()}
    assert rows == {("a", "b"): 2, ("b", "a"): 2}
