"""k-core peeling (operators/graph.k_core)."""

import pytest

from dug_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


@pytest.fixture(scope="module")
def clique_plus_tail(spark):
    # 4-clique {a,b,c,d} + path d-e-f hanging off it
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"),
    ]
    return _edges(spark, pairs)


def test_k3_core_is_the_clique(clique_plus_tail):
    rows = {r["node"]: r["degree"] for r in graph.k_core(clique_plus_tail, k=3).collect()}
    assert rows == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_k2_peel_cascades_down_the_tail(clique_plus_tail):
    # f (deg 1) peels first, THEN e drops to deg 1 and peels — the
    # cascade needs a second round
    rows = {r["node"]: r["degree"] for r in graph.k_core(clique_plus_tail, k=2).collect()}
    assert set(rows) == {"a", "b", "c", "d"}


def test_whole_graph_dissolves(spark):
    # a path has no 2-core
    df = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert graph.k_core(df, k=2).count() == 0


def test_duplicate_and_reverse_edges_collapse(spark):
    # multi-edges / both directions must not inflate degrees
    df = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "x")],
    )
    rows = {r["node"]: r["degree"] for r in graph.k_core(df, k=2).collect()}
    assert rows == {"a": 2, "b": 2, "c": 2}


def test_self_loops_ignored(spark):
    df = _edges(spark, [("a", "a"), ("a", "b")])
    assert graph.k_core(df, k=2).count() == 0


def test_shuffle_mode_matches_broadcast(clique_plus_tail):
    a = sorted(map(tuple, graph.k_core(clique_plus_tail, k=2, broadcast_removed=True).collect()))
    b = sorted(map(tuple, graph.k_core(clique_plus_tail, k=2, broadcast_removed=False).collect()))
    assert a == b


def test_python_mirror_on_web_edges(spark, sf_dir):
    """Operator vs the pure-Python peel over the shared synthetic host
    graph (same arithmetic as the web_edges oracle CTE)."""
    from dug_spark.functions import pyoracle as po

    doc_ids = [r["doc_id"] for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()]
    pairs = po.web_edges_py(doc_ids)
    expected = dict(po.k_core_rows(pairs, k=3))
    got = {
        r["node"]: r["degree"]
        for r in graph.k_core(_edges(spark, pairs) if pairs else None, k=3).collect()
    }
    assert got == expected
