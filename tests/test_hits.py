"""HITS hub/authority scores (graph.hits) vs closed forms and a numpy
power-iteration reference."""

import numpy as np
import pytest

from dug_spark.operators import graph


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _scores(spark, pairs, iterations=10, **kw):
    df = graph.hits(_edges_df(spark, pairs), iterations=iterations, **kw)
    return {r["node"]: (r["hub"], r["authority"]) for r in df.collect()}


def test_hits_complete_bipartite_closed_form(spark):
    # hubs {h1,h2} -> authorities {a1,a2,a3}: converges in one iteration
    # to hub = 1/sqrt(2) each, authority = 1/sqrt(3) each
    pairs = [(h, a) for h in ("h1", "h2") for a in ("a1", "a2", "a3")]
    got = _scores(spark, pairs, iterations=3)
    for h in ("h1", "h2"):
        assert got[h][0] == pytest.approx(1 / 2**0.5)
        assert got[h][1] == 0.0  # no in-edges
    for a in ("a1", "a2", "a3"):
        assert got[a][1] == pytest.approx(1 / 3**0.5)
        assert got[a][0] == 0.0  # no out-edges


def test_hits_matches_numpy_power_iteration(spark):
    # deterministic pseudo-random digraph on 12 nodes
    nodes = [f"n{i}" for i in range(12)]
    pairs = [
        (nodes[i], nodes[(i * 7 + j * 5 + 3) % 12])
        for i in range(12)
        for j in range(3)
        if i != (i * 7 + j * 5 + 3) % 12
    ]
    idx = {v: k for k, v in enumerate(nodes)}
    A = np.zeros((12, 12))
    for s, d in pairs:
        A[idx[s], idx[d]] += 1.0  # parallel edges count multiply
    h = np.full(12, 1 / np.sqrt(12))
    for _ in range(10):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0
    got = _scores(spark, pairs, iterations=10)
    for v in nodes:
        assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-9)
        assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-9)


def test_hits_shuffle_mode_matches_broadcast(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]
    b = _scores(spark, pairs, iterations=6)
    s = _scores(spark, pairs, iterations=6, broadcast_scores=False)
    for v in b:
        assert b[v][0] == pytest.approx(s[v][0], abs=1e-12)
        assert b[v][1] == pytest.approx(s[v][1], abs=1e-12)


def test_hits_empty_graph(spark):
    df = graph.hits(
        spark.createDataFrame([], "src string, dst string"), iterations=2
    )
    assert df.count() == 0
    assert df.columns == ["node", "hub", "authority"]
