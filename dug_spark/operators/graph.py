"""Iterative graph algorithms over DataFrame edge lists: PageRank.

The reference stops at KG assembly (crawler.py expands TranQL answers
into nodes/edges but never ranks them); concept importance ranking is
the natural next step a KG-construction pipeline runs — PageRank over
the co-mention graph surfaces hub concepts, and at web scale the same
operator ranks the host link graph.

Scale shape: ranks and degrees are NODE-sized, edges are corpus-sized.
Each iteration joins edges ⋈ ranks on src — with ``broadcast_ranks``
(the default, right for dictionary-bounded node sets like the concept
graph) the edge side never shuffles; only the dst-keyed contribution
aggregate moves node-sized data.  Past ~10^5-10^6 nodes the per-
iteration re-broadcast dominates — measured at 1.6M nodes / 16M edges
the shuffle join runs ~5× faster per iteration (jobs/
graph_scale_evidence.py; numbers in BASELINE.md) — so pass
``broadcast_ranks=False`` there, and pre-partition edges by src once so
every iteration reuses the exchange.
Each iteration eagerly localCheckpoints the node-sized rank table
(same pattern as the connected-components loop in
operators/canonicalize.py): the contribution join and the dangling
aggregate then share one materialization, and the checkpoint doubles as
the lineage cut without which 10 chained broadcast-join plans compile
quadratically.  The edge list is re-scanned every iteration — callers
with an expensive edge derivation should persist or write it out first.

Dangling mass (nodes with no out-edges) is redistributed uniformly each
iteration — the standard correction; its computation is a one-row
aggregate per iteration (node-sized scan, scalar result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank) with
    Σ rank = 1.  Parallel edges count as multiple edges (pre-dedup the
    input if that is not wanted); self-loops are legal.

        rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/out(u) + dangling/N)

    Deterministic up to float-sum order; callers that hash-compare round
    the result (functions/pyoracle has no mirror — the driver oracle is
    real unrolled-iteration SQL, independently aggregated by DuckDB)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # node-sized precompute, reused every iteration: rank + out_deg
    # (out_deg null ⇒ dangling)
    base = nodes.join(outdeg, "node", "left").localCheckpoint(eager=True)
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))
    ranks = base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    # one-time sink probe: graphs where every node has out-edges (most
    # link graphs after symmetrization, and any k-regular synthetic) have
    # dangling ≡ 0 — skip the per-iteration scalar aggregate entirely
    has_dangling = (
        base.where(F.col("out_deg").isNull()).limit(1).count() > 0
    )

    for i in range(iterations):
        # materialize the node-sized rank table once per iteration: both
        # the contribution join and the dangling aggregate read it, and
        # the eager checkpoint doubles as the lineage cut (10 chained
        # broadcast-join plans otherwise compile quadratically)
        ranks = ranks.localCheckpoint(eager=True)
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            e.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = 0.0
        if has_dangling:
            dangling = (
                ranks.where(F.col("out_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
        ranks = base.join(contribs, "node", "left").select(
            "node",
            "out_deg",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
    return ranks.select("node", "rank")


def triangle_counts(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph induced by ``edges`` (direction, parallel
    edges and self-loops are dropped).  Returns
    ``(node, degree, triangles, clustering)`` with
    ``clustering = 2·T / (d·(d-1))`` (0.0 for d < 2), rounded to 6.

    Algorithm: degree-ordered edge orientation (Cohen 2009 / the
    "compact-forward" MapReduce formulation).  Every undirected edge is
    directed from its lower-(degree, id) endpoint to the higher one, so
    each triangle {a,b,c} is found EXACTLY once as a wedge b←a→c closed
    by the oriented edge b→c — and, critically for web/KG graphs, a
    degree-10^7 hub generates no wedges at all (all its edges point IN),
    bounding the wedge table by the graph's arboricity instead of
    Σ deg².  This is the difference between "works on the test graph"
    and "works on the host link graph": the naive wedge join explodes
    quadratically on the hottest node.

    Scale shape: 3 shuffles total — canonical-edge dedup, the wedge
    self-join on the oriented source key (skew-bounded by orientation, as
    above), and the wedge⋈edge close (pair-keyed).  Degrees are
    NODE-sized and broadcast onto the edge list; the per-node roll-up of
    closed triangles is a map-side-combinable count."""
    e = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("lo"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("hi"),
    ).where(F.col("lo") != F.col("hi")).distinct()
    e = e.localCheckpoint(eager=True)  # reused by degrees, wedges and close
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    dg = F.broadcast(deg)
    withdeg = (
        e.join(dg.withColumnsRenamed({"node": "lo", "degree": "d_lo"}), "lo")
        .join(dg.withColumnsRenamed({"node": "hi", "degree": "d_hi"}), "hi")
    )
    lo_first = (F.col("d_lo") < F.col("d_hi")) | (
        (F.col("d_lo") == F.col("d_hi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
        F.when(lo_first, F.col("d_hi")).otherwise(F.col("d_lo")).alias("d_v"),
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("b"), F.col("d_v").alias("d_b"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("c"), F.col("d_v").alias("d_c"))
    b_first = (F.col("d_b") < F.col("d_c")) | (
        (F.col("d_b") == F.col("d_c")) & (F.col("b") < F.col("c"))
    )
    wedges = (
        o1.join(o2, "u")
        .where(F.col("b") != F.col("c"))
        .where(b_first)  # each unordered wedge once, endpoints rank-ordered
        .select("u", "b", "c")
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    tri = (
        closed.select(F.explode(F.array("u", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    cc = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1.0)),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tri, "node", "left")
        .na.fill({"triangles": 0})
        .select("node", "degree", "triangles", F.round(cc, 6).alias("clustering"))
    )
