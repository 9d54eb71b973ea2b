"""Operator package + the annotator registry (SURVEY §2.10).

The reference's only extension surface is pluggy-registered parsers and
annotators (annotators/__init__.py:16-38 — "monarch" and "sapbert",
error-on-unknown lookup).  Spark mapping: named annotate callables, each
`(corpus, dictionary, **kw) -> mentions DataFrame` built from Arrow
`mapInPandas` stages — same lookup semantics including the error message
shape, selected by config string exactly like ``get_annotator``.

- "monarch": dictionary/trie presence matching only (AnnotateMonarch
  returns every span's identifiers; filtering happens downstream).
- "sapbert": trie matching + candidate ranking with score threshold and
  top-k (AnnotateSapbert ranks candidates, score cutoff 0.8, top 10 —
  sapbert_annotator.py:281,310-319 re-expressed as the deterministic
  n-gram link scorer in operators/link.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class AnnotatorNotFoundException(Exception):
    pass


def _annotate_monarch(corpus: DataFrame, dictionary: DataFrame, **kw) -> DataFrame:
    from . import annotate

    return annotate.annotate_mentions(corpus, dictionary, **kw)


def _annotate_sapbert(
    corpus: DataFrame,
    dictionary: DataFrame,
    score_threshold: float = 0.8,
    top_k: int = 10,
    **kw,
) -> DataFrame:
    from . import annotate, link

    m = annotate.annotate_mentions(corpus, dictionary, **kw)
    return link.score_candidates(m, score_threshold, top_k, dictionary=dictionary)


_ANNOTATORS = {
    "monarch": _annotate_monarch,
    "sapbert": _annotate_sapbert,
}


def get_annotator(name: str):
    """Error-on-unknown lookup (annotators/__init__.py:25-38)."""
    fn = _ANNOTATORS.get(name.lower())
    if fn is not None:
        return fn
    raise AnnotatorNotFoundException(
        f"Cannot find annotator of type '{name}'\n"
        f"Supported annotators: {', '.join(_ANNOTATORS)}"
    )
