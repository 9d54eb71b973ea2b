"""Entity-link candidate scoring: threshold + top-k per mention.

Replaces the reference SapBERT ranking call
(/root/reference/src/dug/core/annotators/sapbert_annotator.py:233-320):
top-10 candidates per mention (:276-283 ``"count": 10``), score threshold
0.8 (:310-319, config.py:51).  The embedding score is replaced by a
deterministic character-n-gram Jaccard between the mention surface and the
candidate label (vectorized pandas UDF), combined with the dictionary
prior.

Scale: pure narrow ops + one window over (element_id, search_text) — the
window partitions by mention, which is high-cardinality and well
distributed, so no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import ngram_jaccard_udf


def score_candidates(
    mentions: DataFrame,
    score_threshold: float = 0.8,
    top_k: int = 10,
    blend: float = 0.5,
) -> DataFrame:
    """MENTIONS → mentions with ``link_score``; keeps candidates whose
    blended score ≥ threshold, then the top_k per (element, surface) by
    (score desc, curie asc) — deterministic tie-break."""
    nj = ngram_jaccard_udf(3)
    scored = mentions.withColumn(
        "link_score",
        F.round(
            blend * F.coalesce("score", F.lit(0.0))
            + (1.0 - blend) * nj(F.col("search_text"), F.col("label")),
            6,
        ),
    )
    # F5: threshold on the dictionary prior (reference thresholds the
    # service score before ranking)
    kept = scored.where(F.coalesce("score", F.lit(0.0)) >= F.lit(score_threshold))
    w = (
        Window.partitionBy("element_id", "search_text")
        .orderBy(F.desc("link_score"), F.asc("curie"))
    )
    return (
        kept.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .drop("_rk")
    )
