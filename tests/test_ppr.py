"""Personalized PageRank (graph.personalized_pagerank) — pure-Python
power-iteration cross-check + PPR-specific invariants."""

import pytest

from dug_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _reset(spark, rows):
    return spark.createDataFrame(rows, "node string, weight double")


def _ppr_py(pairs, reset, d=0.85, iters=10):
    nodes = sorted(
        {s for s, _ in pairs} | {t for _, t in pairs} | set(reset)
    )
    out = {}
    for s, t in pairs:
        out.setdefault(s, []).append(t)
    tot = sum(reset.values())
    w = {v: reset.get(v, 0.0) / tot for v in nodes}
    rank = dict(w)
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        dang = 0.0
        for u in nodes:
            if u in out:
                share = rank[u] / len(out[u])
                for v in out[u]:
                    contrib[v] += share
            else:
                dang += rank[u]
        rank = {
            v: (1 - d) * w[v] + d * (contrib[v] + dang * w[v]) for v in nodes
        }
    return rank


@pytest.fixture(scope="module")
def chain_graph(spark):
    # a -> b -> c -> d, plus d dangling and a side edge b -> d
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d")]
    return pairs, _edges(spark, pairs)


def test_matches_python_power_iteration(spark, chain_graph):
    pairs, e = chain_graph
    reset = {"a": 1.0}
    got = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, list(reset.items())), iterations=10
        ).collect()
    }
    want = _ppr_py(pairs, reset, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_mass_conserved_and_seed_biased(spark, chain_graph):
    pairs, e = chain_graph
    got = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, [("a", 1.0)]), iterations=12
        ).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # teleport lands only on a: a outranks the symmetric-position c
    assert got["a"] > got["c"]


def test_zero_weight_outside_reset_component(spark):
    # two disconnected components; reset mass in one ⇒ the other gets 0
    e = _edges(spark, [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")])
    got = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, [("a", 1.0)]), iterations=8
        ).collect()
    }
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] + got["b"] == pytest.approx(1.0, abs=1e-9)


def test_multi_seed_weights_normalize(spark, chain_graph):
    pairs, e = chain_graph
    # weights 3:1 normalize identically to 0.75:0.25
    g1 = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, [("a", 3.0), ("c", 1.0)]), iterations=6
        ).collect()
    }
    g2 = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, [("a", 0.75), ("c", 0.25)]), iterations=6
        ).collect()
    }
    for v in g1:
        assert g1[v] == pytest.approx(g2[v], abs=1e-12)
    want = _ppr_py(pairs, {"a": 3.0, "c": 1.0}, iters=6)
    for v in want:
        assert g1[v] == pytest.approx(want[v], abs=1e-12)


def test_reset_only_node_is_included(spark):
    # a seed that no edge touches still appears (teleport target)
    e = _edges(spark, [("a", "b")])
    got = {
        r["node"]: r["rank"]
        for r in graph.personalized_pagerank(
            e, _reset(spark, [("z", 1.0)]), iterations=5
        ).collect()
    }
    assert "z" in got and got["z"] > 0.5  # z is dangling: keeps its mass


def test_zero_total_weight_raises(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError):
        graph.personalized_pagerank(e, _reset(spark, [("a", 0.0)]))


def test_shuffle_mode_matches_broadcast(spark, chain_graph):
    pairs, e = chain_graph
    rs = _reset(spark, [("a", 1.0)])
    a = sorted(
        (r["node"], round(r["rank"], 12))
        for r in graph.personalized_pagerank(
            e, rs, iterations=6, broadcast_ranks=True
        ).collect()
    )
    b = sorted(
        (r["node"], round(r["rank"], 12))
        for r in graph.personalized_pagerank(
            e, rs, iterations=6, broadcast_ranks=False
        ).collect()
    )
    assert a == b
