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
