"""Two-phase star connected components (canonicalize.connected_components_star)."""

import random

import pytest
from pyspark.sql import functions as F

from dug_spark.operators import canonicalize


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src string, dst string")
    return {
        (r.id, r.comp)
        for r in canonicalize.connected_components_star(edges).collect()
    }


def test_known_components(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z")])
    # self-loop-only node z still appears? src != dst filter drops the
    # edge AND the node — same contract as connected_components, which
    # derives nodes from edges; z has no non-self edge so no row.
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_matches_label_propagation_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        pairs = [
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(70)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, "src string, dst string")
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        want = {
            (r.id, r.comp)
            for r in canonicalize.connected_components(sym).collect()
        }
        got = _cc(spark, pairs)
        assert got == want, f"trial {trial}"


def test_long_chain_beyond_propagation_budget(spark):
    # a 60-hop chain: min-label propagation at max_iter=25 MUST refuse
    # (labels are not a fixpoint), star contraction converges comfortably
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(60)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    with pytest.raises(RuntimeError):
        canonicalize.connected_components(sym, max_iter=25)
    got = _cc(spark, chain)
    assert got == {(f"c{i:03d}", "c000") for i in range(61)}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert canonicalize.connected_components_star(edges).count() == 0
