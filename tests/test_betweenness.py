"""Approximate betweenness (graph.betweenness) — hand values + the
pure-Python Brandes mirror (functions/pyoracle.betweenness_rows)."""

import pytest

from dug_spark.functions import pyoracle as po
from dug_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _seeds(spark, names):
    return spark.createDataFrame([(n,) for n in names], "seed string")


def _run(spark, pairs, seeds, max_depth=15):
    return {
        r["node"]: r["betweenness"]
        for r in graph.betweenness(
            _edges(spark, pairs), _seeds(spark, seeds), max_depth=max_depth
        ).collect()
    }


def test_path_broker(spark):
    # a -> b -> c: all a-sourced paths to c route through b
    got = _run(spark, [("a", "b"), ("b", "c")], ["a"])
    assert got == {"b": 1.0, "c": 0.0}


def test_diamond_splits_dependency(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    got = _run(spark, pairs, ["a"])
    assert got["b"] == pytest.approx(0.5)
    assert got["c"] == pytest.approx(0.5)
    assert got["d"] == 0.0


def test_all_sources_matches_mirror(spark):
    # deterministic directed graph on 9 nodes, exact (all sources)
    nodes = [f"n{i}" for i in range(9)]
    pairs = [
        (nodes[i], nodes[j])
        for i in range(9)
        for j in range(9)
        if i != j and (i * 5 + j * 7) % 6 == 0
    ]
    got = _run(spark, pairs, nodes)
    want = dict(po.betweenness_rows(pairs, nodes))
    assert set(got) == set(want)
    for v, bc in want.items():
        assert round(got[v], 5) == pytest.approx(bc)


def test_depth_cap_matches_mirror(spark):
    # a long path: cap at 2 cuts deep dependencies identically
    pairs = [(f"p{i}", f"p{i+1}") for i in range(6)]
    got = _run(spark, pairs, ["p0"], max_depth=2)
    want = dict(po.betweenness_rows(pairs, ["p0"], max_depth=2))
    assert {k: round(v, 5) for k, v in got.items()} == want


def test_duplicate_and_self_edges_dropped(spark):
    pairs = [("a", "b"), ("a", "b"), ("b", "b"), ("b", "c")]
    got = _run(spark, pairs, ["a"])
    assert got == {"b": 1.0, "c": 0.0}


def test_multi_seed_sums(spark):
    # path a->b->c seeded from both ends of the reversed pair of edges
    pairs = [("a", "b"), ("b", "c"), ("c", "b"), ("b", "a")]
    got = _run(spark, pairs, ["a", "c"])
    want = dict(po.betweenness_rows(pairs, ["a", "c"]))
    assert {k: round(v, 5) for k, v in got.items()} == want
    assert got["b"] == pytest.approx(2.0)  # broker for both sources
