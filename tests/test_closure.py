"""Transitive closure (graph.transitive_closure) vs hand-derived sets: a
Python BFS mirror, min-depth through diamonds, cycle detection."""

import pytest

from dug_spark.operators import graph


def _closure(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r["src"], r["dst"]): r["depth"]
        for r in graph.transitive_closure(df, **kw).collect()
    }


def _bfs_mirror(edges):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = {}
    for start in adj:
        frontier, depth, seen = adj[start], 1, set()
        while frontier:
            for n in frontier:
                if (start, n) not in out:
                    out[(start, n)] = depth
            seen |= frontier
            frontier = {
                m for n in frontier for m in adj.get(n, ()) if m not in seen
            }
            depth += 1
    return out


def test_chain_depths(spark):
    got = _closure(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3,
    }


def test_diamond_min_depth(spark):
    # a→b→d and a→c→d plus the shortcut a→d: depth(a,d) must be 1
    got = _closure(
        spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]
    )
    assert got[("a", "d")] == 1
    assert got[("b", "d")] == 1 and got[("a", "b")] == 1


def test_matches_bfs_mirror(spark):
    # binary tree + every-3rd cross edge over 40 nodes (the oracle shape)
    edges = [(f"n{i}", f"n{i // 2}") for i in range(1, 40)] + [
        (f"n{i}", f"n{i // 3}") for i in range(2, 40) if i % 3 == 0
    ]
    edges = sorted(set(edges))
    assert _closure(spark, edges) == _bfs_mirror(edges)


def test_parallel_and_duplicate_edges_collapse(spark):
    got = _closure(spark, [("a", "b"), ("a", "b"), ("b", "c")])
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 2}


def test_cycle_converges_with_self_pairs(spark):
    got = _closure(spark, [("a", "b"), ("b", "a")])
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 2, ("b", "b"): 2,
    }


def test_depth_guard_raises(spark):
    # a 6-chain needs 5 rounds; capping at 3 must raise, not truncate
    chain = [(f"n{i}", f"n{i + 1}") for i in range(6)]
    with pytest.raises(ValueError, match="not converged"):
        _closure(spark, chain, max_iterations=3)


def test_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", None), (None, "b")], "src string, dst string"
    )
    got = {
        (r["src"], r["dst"]): r["depth"]
        for r in graph.transitive_closure(df).collect()
    }
    assert got == {("a", "b"): 1}


def test_all_strategies_agree(spark):
    # driver fast path vs distributed doubling vs semi-naive frontier:
    # identical (src, dst, depth) sets on the oracle-shaped DAG + a cycle
    edges = [(f"n{i}", f"n{i // 2}") for i in range(1, 40)] + [
        (f"n{i}", f"n{i // 3}") for i in range(2, 40) if i % 3 == 0
    ] + [("c0", "c1"), ("c1", "c0")]
    edges = sorted(set(edges))
    driver = _closure(spark, edges)  # cutoff default takes the fast path
    doubling = _closure(spark, edges, driver_cutoff_edges=0)
    seminaive = _closure(
        spark, edges, driver_cutoff_edges=0, strategy="seminaive"
    )
    assert driver == doubling == seminaive


def test_driver_pair_cap_falls_back(spark):
    # a pair cap the closure overruns must fall back to the distributed
    # loop and still return the full exact result
    chain = [(f"n{i}", f"n{i + 1}") for i in range(12)]
    got = _closure(spark, chain, driver_pair_cap=5)
    assert got == _bfs_mirror(chain)


def test_depth_guard_raises_distributed(spark):
    chain = [(f"n{i}", f"n{i + 1}") for i in range(6)]
    with pytest.raises(ValueError, match="not converged"):
        _closure(
            spark, chain, max_iterations=1, driver_cutoff_edges=0,
            strategy="seminaive",
        )
