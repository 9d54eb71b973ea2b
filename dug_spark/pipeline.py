"""End-to-end pipeline: web corpus → mentions → normalized/canonical
concepts → triples (+ optional KG expansion).

Mirrors the reference crawl lifecycle (crawler.py:45-107: parse → annotate
→ normalize → expand → index) as ONE declarative DataFrame plan per stage;
node boundaries that were HTTP calls in the reference become broadcast
joins or shuffles that Catalyst schedules.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import extract_text_udf
from .operators import annotate, canonicalize, concepts, link, normalize, triples


@dataclass
class PipelineResult:
    mentions: DataFrame
    concepts: DataFrame
    element_concept: DataFrame
    triples: DataFrame


@dataclass
class Pipeline:
    """Configurable corpus→triples pipeline.

    dictionary / curie_norm / synonyms / kg_edges are dimension
    DataFrames (broadcastable); corpus is the fact table.
    """

    dictionary: DataFrame
    curie_norm: DataFrame | None = None
    synonyms: DataFrame | None = None
    kg_edges: DataFrame | None = None
    score_threshold: float = 0.8
    top_k: int = 10
    langs: list[str] = field(default_factory=lambda: ["en"])
    use_extracted_html: bool = False
    canonicalize: bool = True
    greenlist: list[str] | None = None  # None → reference default (F6)

    def run(self, corpus: DataFrame) -> PipelineResult:
        df = corpus
        if self.langs:
            df = df.where(F.col("lang").isin(self.langs))
        # parallelism floor: a small-file scan can collapse to 1 input
        # partition (parquet splits only at row-group boundaries), which
        # would serialize every downstream pandas-UDF stage.  At real
        # corpus scale the scan already has thousands of partitions and
        # this is a no-op.
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target, "url")
        if self.use_extracted_html:
            # BASELINE invariant: extract_text(html) byte-identical to text
            df = df.withColumn("text", extract_text_udf(F.col("html")))

        m = annotate.annotate_mentions(df, self.dictionary)
        m = link.score_candidates(m, self.score_threshold, self.top_k)
        if self.curie_norm is not None:
            m = normalize.normalize_mentions(m, self.curie_norm, self.greenlist)
            if self.canonicalize:
                m = canonicalize.canonicalize_mentions(m, self.curie_norm)
        if self.synonyms is not None:
            m = normalize.attach_synonyms(m, self.synonyms)

        conc = concepts.build_concepts(m)
        edges = concepts.element_concept_edges(m)
        trip = triples.build_triples(m, self.kg_edges)
        return PipelineResult(
            mentions=m, concepts=conc, element_concept=edges, triples=trip
        )
