"""Entity-link candidate scoring: threshold + top-k per mention.

Replaces the reference SapBERT ranking call
(/root/reference/src/dug/core/annotators/sapbert_annotator.py:233-320):
top-10 candidates per mention (:276-283 ``"count": 10``), score threshold
0.8 (:310-319, config.py:51).  The embedding score is replaced by a
deterministic character-n-gram Jaccard between the mention surface and the
candidate label (vectorized pandas UDF), combined with the dictionary
prior.

Scale design: the score is a pure function of (surface, candidate-label,
prior), so ranking runs on the DISTINCT (search_text, curie) pairs — a
dictionary-bounded set — and the verdict is broadcast-joined back to the
corpus-sized mentions table.  The 100 TB side is never shuffled or pushed
through Python; cost is O(distinct pairs) instead of O(mentions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ngram_jaccard_udf


def score_candidate_pairs(
    pairs: DataFrame,
    score_threshold: float = 0.8,
    top_k: int = 10,
    blend: float = 0.5,
) -> DataFrame:
    """(search_text, curie, label, score) pairs → scored + ranked pairs.

    Keeps pairs whose dictionary prior ≥ threshold (F5), then the top_k
    per surface by (link_score desc, curie asc) — deterministic tie-break.
    Per-surface ranking equals the reference's per-mention ranking because
    every mention with the same surface sees the same candidate set.
    """
    nj = ngram_jaccard_udf(3)
    scored = pairs.withColumn(
        "link_score",
        F.round(
            blend * F.coalesce("score", F.lit(0.0))
            + (1.0 - blend) * nj(F.col("search_text"), F.col("label")),
            6,
        ),
    )
    kept = scored.where(F.coalesce("score", F.lit(0.0)) >= F.lit(score_threshold))
    w = Window.partitionBy("search_text").orderBy(F.desc("link_score"), F.asc("curie"))
    return (
        kept.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .drop("_rk")
    )


def score_candidates(
    mentions: DataFrame,
    score_threshold: float = 0.8,
    top_k: int = 10,
    blend: float = 0.5,
    dictionary: DataFrame | None = None,
) -> DataFrame:
    """MENTIONS → mentions with ``link_score``, thresholded + top-k.

    The distinct-pair table is broadcast back onto mentions, so the big
    side stays un-shuffled (T3 semantics, sapbert_annotator.py:276-319).

    Pass the ``dictionary`` to derive the candidate pairs from it directly
    (the annotator emits every dictionary entry for a matched term, so the
    per-surface candidate set is the dictionary's own (term → entries) map)
    — this skips a distinct() over the corpus-sized mentions table, i.e.
    one full annotation scan + shuffle per run.
    """
    if dictionary is not None:
        pairs = dictionary.select(
            F.col("term").alias("search_text"), "curie", "label", "score"
        )
    else:
        pairs = mentions.select("search_text", "curie", "label", "score").distinct()
    kept = score_candidate_pairs(pairs, score_threshold, top_k, blend).select(
        "search_text", "curie", "link_score"
    )
    return mentions.join(F.broadcast(kept), ["search_text", "curie"], "inner")


def disambiguate_mentions(
    candidates: DataFrame,
    concept_types: DataFrame,
    doc_col: str = "element_id",
    surface_col: str = "search_text",
    prior_col: str = "score",
) -> DataFrame:
    """Entity disambiguation by type coherence: for every ambiguous
    surface occurrence (one ``(doc, surface)`` span with >1 candidate
    CURIE), rank candidates by how many ANCHOR concepts of the same
    semantic type the document carries, then by the dictionary prior,
    then by CURIE (deterministic).  Anchors are the document's
    unambiguous mentions — spans whose surface maps to exactly one
    candidate — the standard bootstrap in collective entity linking
    (Cucerzan 2007 §3: disambiguated context entities vote for the
    candidate they cohere with; type overlap is the coarse-grained
    coherence signal that needs no external link graph).

    The reference defers this entirely to its annotator service
    (annotate.py keeps every identifier the Monarch annotator returns
    for a span); a from-scratch pipeline must resolve the one-surface →
    many-CURIEs case itself before canonicalization.

    Inputs: ``candidates`` with (doc, surface, curie, prior) — one row
    per distinct candidate per span; ``concept_types`` — the
    dimension-sized (curie, ctype) table (from the dictionary).

    Returns ONE ROW PER INPUT CANDIDATE (verdict contract, like
    curate_corpus): (doc, surface, curie, prior, n_cands, coherence,
    chosen) where coherence = distinct same-type anchor concepts in the
    document minus the candidate itself if anchored, and exactly one
    candidate per span has chosen = true.

    Scale shape: concept_types is dictionary-bounded and broadcast; the
    corpus-sized candidate table shuffles on the document key only —
    span stats (window), anchor type counts (doc-keyed agg), coherence
    stitch (doc-keyed joins), winner election (span window).  No
    concept-keyed shuffle, so hot CURIEs (the skew axis) never key an
    exchange."""
    c = (
        candidates.select(
            F.col(doc_col).alias("doc"),
            F.col(surface_col).alias("surface"),
            "curie",
            F.col(prior_col).alias("prior"),
        )
        .distinct()
    )
    typed = c.join(
        F.broadcast(concept_types.select("curie", "ctype")), "curie", "left"
    )
    span_w = Window.partitionBy("doc", "surface")
    typed = typed.withColumn(
        "n_cands", F.size(F.collect_set("curie").over(span_w))
    ).localCheckpoint(eager=False)
    anchors = typed.where(F.col("n_cands") == 1).select(
        "doc", "curie", "ctype"
    ).distinct()
    tcount = anchors.groupBy("doc", "ctype").agg(
        F.count_distinct("curie").alias("nt")
    )
    amem = anchors.select("doc", "curie").withColumn("is_anchor", F.lit(1))
    scored = (
        typed.join(tcount, ["doc", "ctype"], "left")
        .join(amem, ["doc", "curie"], "left")
        .withColumn(
            "coherence",
            F.coalesce("nt", F.lit(0)).cast("long")
            - F.coalesce("is_anchor", F.lit(0)),
        )
    )
    rank_w = Window.partitionBy("doc", "surface").orderBy(
        F.desc("coherence"), F.desc("prior"), F.asc("curie")
    )
    return scored.withColumn(
        "chosen", F.row_number().over(rank_w) == 1
    ).select(
        F.col("doc").alias(doc_col),
        F.col("surface").alias(surface_col),
        "curie",
        F.col("prior").alias(prior_col),
        "n_cands",
        "coherence",
        "chosen",
    )
