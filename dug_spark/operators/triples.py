"""Triple materialization — the engine's native output table.

The reference hides its KG inside JSON documents: (element)-[HAS_CONCEPT]->
(concept) via element.concepts (crawler.py:153-176), (concept)-[...]->(node)
via TranQL answers (crawler.py:178-201).  Here they are first-class rows of
a normalized ``triples(subj, pred, obj, source_partition, lineage)`` table
(BASELINE north_rule), partitioned for scale and salted on hot keys.

Triple families:
- HAS_CONCEPT       element/url → canonical concept curie
- biolink:subclass_of  concept → ontology parent (from kg_edges)
- co_mentioned_with  concept ↔ concept co-occurring in one document
                     (canonical pair order subj < obj)

Scale notes: the co-mention self-join is quadratic per document in the
number of distinct concepts — bounded by `max_concepts_per_doc` exactly as
a real pipeline caps fan-out; hot concepts are handled by AQE skew joins
and plans/skew.salted_repartition before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HAS_CONCEPT = "HAS_CONCEPT"
SUBCLASS_OF = "biolink:subclass_of"
CO_MENTIONED = "co_mentioned_with"


def _finish(df: DataFrame, lineage: str) -> DataFrame:
    return df.select(
        "subj",
        "pred",
        "obj",
        F.spark_partition_id().alias("source_partition"),
        F.lit(lineage).alias("lineage"),
    )


def has_concept_triples(mentions: DataFrame, assume_distinct: bool = False) -> DataFrame:
    """distinct (element, HAS_CONCEPT, curie).  assume_distinct skips the
    dedup shuffle when the input is already distinct (element_id, curie)
    pairs — as in build_triples."""
    out = mentions.select(
        F.col("element_id").alias("subj"),
        F.lit(HAS_CONCEPT).alias("pred"),
        F.col("curie").alias("obj"),
    )
    return _finish(out if assume_distinct else out.distinct(), "annotate")


def subclass_triples(mentions: DataFrame, kg_edges: DataFrame) -> DataFrame:
    """concept → parent for every subclass_of edge whose subject is a
    mentioned concept (broadcast semi-join keeps only live concepts)."""
    live = mentions.select(F.col("curie")).distinct()
    edges = kg_edges.where(F.col("predicate") == SUBCLASS_OF)
    return _finish(
        edges.join(live, edges["subject"] == live["curie"], "left_semi").select(
            F.col("subject").alias("subj"),
            F.lit(SUBCLASS_OF).alias("pred"),
            F.col("object").alias("obj"),
        ).distinct(),
        "expand",
    )


def co_mention_triples(
    mentions: DataFrame, max_concepts_per_doc: int = 64
) -> DataFrame:
    """Unordered concept pairs co-occurring in one document, emitted once
    per pair with subj < obj.

    Implemented as collect_set per document + posexplode pair generation
    (one shuffle on the document key, which is unique → no skew), instead
    of a mentions⋈mentions self-join (two shuffles on the skewed curie
    key)."""
    per_doc = (
        mentions.groupBy("element_id")
        .agg(F.array_sort(F.collect_set("curie")).alias("cs"))
        .where(F.size("cs").between(2, max_concepts_per_doc))
    )
    # explode-amplification guard: the per-doc arrays are tiny (AQE
    # coalesces them to ~1 MB partitions) but each row explodes to
    # O(concepts²) pairs — repartition BEFORE the explode so the
    # amplification runs at full cluster width, not at the coalesced width
    width = mentions.sparkSession.sparkContext.defaultParallelism * 2
    per_doc = per_doc.repartition(width, "element_id")
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    "cs",
                    lambda c, i: F.transform(
                        F.slice("cs", i + 2, F.size("cs")), lambda d: F.struct(c.alias("a"), d.alias("b"))
                    ),
                )
            )
        ).alias("p")
    )
    return _finish(
        pairs.select(
            F.col("p.a").alias("subj"),
            F.lit(CO_MENTIONED).alias("pred"),
            F.col("p.b").alias("obj"),
        ).distinct(),
        "co_mention",
    )


def build_triples(
    mentions: DataFrame,
    kg_edges: DataFrame | None = None,
    max_concepts_per_doc: int = 64,
) -> DataFrame:
    """Union of the three triple families over ONE annotation pass.

    Every family consumes only the distinct (element_id, curie) pairs, so
    that narrow projection is computed once and persisted — without it the
    union re-runs the Python annotation scan of the whole corpus per
    branch (3× the dominant cost at any scale).  MEMORY_AND_DISK: the
    pair table is two string columns, orders of magnitude smaller than
    the corpus, but still spills instead of OOMing on 100 TB inputs."""
    from pyspark import StorageLevel

    doc_concepts = (
        mentions.select("element_id", "curie")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = has_concept_triples(doc_concepts, assume_distinct=True)
    if kg_edges is not None:
        out = out.unionByName(subclass_triples(doc_concepts, kg_edges))
    return out.unionByName(co_mention_triples(doc_concepts, max_concepts_per_doc))
