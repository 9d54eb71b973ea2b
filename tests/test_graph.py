"""PageRank (operators/graph.py): golden values on hand-checkable graphs,
mass conservation, dangling redistribution, broadcast/shuffle-join parity."""

import pytest
from pyspark.sql import functions as F

from dug_spark.operators import graph


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def _py_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / out[s]
        dangling = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: (1 - damping) / n + damping * (contrib[v] + dangling / n)
            for v in nodes
        }
    return rank


@pytest.fixture
def edges_df(spark):
    def make(pairs):
        return spark.createDataFrame(pairs, "src string, dst string")

    return make


def test_two_node_cycle_is_uniform(spark, edges_df):
    got = _ranks(graph.pagerank(edges_df([("a", "b"), ("b", "a")])))
    assert got["a"] == pytest.approx(0.5) and got["b"] == pytest.approx(0.5)


def test_chain_with_dangling_sink(spark, edges_df):
    pairs = [("a", "b"), ("b", "c")]  # c is a sink: dangling mass path
    got = _ranks(graph.pagerank(edges_df(pairs)))
    exp = _py_pagerank(pairs)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["c"] > got["b"] > got["a"]


def test_hub_graph_matches_reference_impl(spark, edges_df):
    pairs = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"),
        ("hub", "a"), ("c", "a"), ("d", "c"),
    ]
    got = _ranks(graph.pagerank(edges_df(pairs), iterations=15))
    exp = _py_pagerank(pairs, iterations=15)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert max(got, key=got.get) == "hub"


def test_parallel_edges_count_twice(spark, edges_df):
    # a has two edges to b and one to c: b gets 2/3 of a's rank
    pairs = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    got = _ranks(graph.pagerank(edges_df(pairs)))
    exp = _py_pagerank(pairs)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert got["b"] > got["c"]


def test_shuffle_join_path_matches_broadcast(spark, edges_df):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    bc = _ranks(graph.pagerank(edges_df(pairs), iterations=5))
    sh = _ranks(
        graph.pagerank(edges_df(pairs), iterations=5, broadcast_ranks=False)
    )
    for v in bc:
        assert sh[v] == pytest.approx(bc[v], abs=1e-12)


def test_empty_graph(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank(e).count() == 0


# --- warm-start PageRank -----------------------------------------------------


def _pr_edges(spark):
    pairs = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (3, 4), (4, 2),
        (5, 0), (5, 2), (0, 5),
    ]
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_warm_start_is_fixed_point(spark):
    from dug_spark.operators.graph import pagerank

    e = _pr_edges(spark)
    converged = pagerank(e, iterations=40)
    one_more = pagerank(e, iterations=1, init_ranks=converged)
    c = {r["node"]: r["rank"] for r in converged.collect()}
    w = {r["node"]: r["rank"] for r in one_more.collect()}
    # a converged vector is (numerically) a fixed point of one iteration
    assert max(abs(c[n] - w[n]) for n in c) < 1e-6


def test_pagerank_warm_start_renormalizes_and_converges_same(spark):
    from pyspark.sql import functions as F2

    from dug_spark.operators.graph import pagerank

    e = _pr_edges(spark)
    cold = {r["node"]: r["rank"] for r in pagerank(e, iterations=40).collect()}
    # stale input scaled by 7 and missing one node: still the same fixed
    # point after enough iterations
    stale = (
        pagerank(e, iterations=5)
        .where(F2.col("node") != 5)
        .select("node", (F2.col("rank") * 7).alias("rank"))
    )
    warm = {
        r["node"]: r["rank"]
        for r in pagerank(e, iterations=40, init_ranks=stale).collect()
    }
    assert max(abs(cold[n] - warm[n]) for n in cold) < 1e-6


def test_pagerank_warm_start_converges_faster(spark):
    from dug_spark.operators.graph import pagerank

    e = _pr_edges(spark)
    fixed = {r["node"]: r["rank"] for r in pagerank(e, iterations=60).collect()}
    prev = pagerank(e, iterations=60)
    # perturb the graph: one new edge
    e2 = e.union(spark.createDataFrame([(4, 5)], "src long, dst long"))
    fixed2 = {
        r["node"]: r["rank"] for r in pagerank(e2, iterations=60).collect()
    }

    def l1(ranks):
        got = {r["node"]: r["rank"] for r in ranks.collect()}
        return sum(abs(got[n] - fixed2[n]) for n in fixed2)

    warm3 = l1(pagerank(e2, iterations=3, init_ranks=prev))
    cold3 = l1(pagerank(e2, iterations=3))
    # after the same 3 iterations the warm start is strictly closer to
    # the new fixed point than the cold start
    assert warm3 < cold3 / 3


def test_weighted_pagerank_properties(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import graph

    # weight=1.0 everywhere == unweighted, bit-for-bit
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    w1 = edges.withColumn("w", F.lit(1.0))
    plain = {
        r.node: r.rank
        for r in graph.pagerank(edges, iterations=5).collect()
    }
    weighted = {
        r.node: r.rank
        for r in graph.pagerank(w1, iterations=5, weight_col="w").collect()
    }
    assert plain == weighted
    # weight dominance: a pours 99% of its mass to b -> rank(b) > rank(c)
    skew = spark.createDataFrame(
        [("a", "b", 99.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    ranks = {
        r.node: r.rank
        for r in graph.pagerank(skew, iterations=10, weight_col="w").collect()
    }
    assert ranks["b"] > ranks["c"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # non-positive weights drop: the zero-weight edge's source becomes
    # dangling, not an edge that contributes nothing
    z = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "a", 0.0)], "src string, dst string, w double"
    )
    rz = {r.node: r.rank for r in graph.pagerank(z, iterations=3, weight_col="w").collect()}
    assert abs(sum(rz.values()) - 1.0) < 1e-9
