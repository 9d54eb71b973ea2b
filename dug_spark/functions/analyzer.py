"""Shared search analyzer: the engine-side equivalent of the reference's
``std_with_stopwords`` Elasticsearch analyzer (index.py:87-91 — type
"standard" with ``stopwords: _english_``), declared on every text field of
all three indexes (index.py:96-117).

Semantics reproduced:
- standard tokenization → stand-in: lowercase + split on non-alphanumeric
  runs (the ES standard tokenizer uses UAX#29 word boundaries; for ASCII
  text the two agree — the Unicode-grapheme difference is a documented
  deviation, irrelevant to the synthetic corpora);
- lowercase (standard analyzer default);
- ``_english_`` stop removal — Lucene's ENGLISH_STOP_WORDS_SET (33 words,
  public constant), applied identically to indexed text and query text.

No stemmer: the reference uses the *standard* analyzer with stopwords, not
the ``english`` analyzer, so there is no stemming to reproduce.

One further deviation, documented: ES ``match_phrase`` leaves position
gaps where stopwords were removed and requires term positions to line up
across the gap; the engine's phrase gate matches the stopword-stripped
token sequences contiguously — equivalent except for phrases whose
non-stop terms were separated by stopwords in the DOCUMENT but not the
query (or vice versa).

Both a Spark Column builder and a pure-Python mirror are provided so
operators, DuckDB oracle SQL, and pytest goldens tokenize identically.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Lucene StopAnalyzer.ENGLISH_STOP_WORDS_SET — what ES ``_english_`` means.
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def analyze(text: str | None, stopwords: bool = True) -> list[str]:
    """Pure-Python mirror of ``analyze_col`` (for goldens / driver-side
    oracle recomputes)."""
    if not text:
        return []
    toks = [t for t in _TOKEN_SPLIT.split(text.lower()) if t]
    if stopwords:
        stop = set(ENGLISH_STOPWORDS)
        toks = [t for t in toks if t not in stop]
    return toks


def analyze_col(col, stopwords: bool = True) -> Column:
    """Analyzed token array of a string column — entirely JVM-side
    (split + filter, whole-stage codegen; no UDF)."""
    toks = F.split(F.lower(col), "[^a-z0-9]+")
    if stopwords:
        return F.filter(
            toks, lambda x: (F.length(x) > 0) & ~x.isin(*ENGLISH_STOPWORDS)
        )
    return F.filter(toks, lambda x: F.length(x) > 0)


def analyze_spark_col_sql(expr: str, stopwords: bool = True) -> str:
    """Spark-SQL text twin of ``analyze_col`` — the same split + filter
    expression composed as one string, for call sites that assemble
    whole queries as SQL text (py4j round-trip economy).  ``expr`` is a
    Spark SQL fragment (column reference or expression)."""
    toks = f"split(lower({expr}), '[^a-z0-9]+')"
    if stopwords:
        stop = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
        return (
            f"filter({toks}, x -> (length(x) > 0)"
            f" AND (NOT (x IN ({stop}))))"
        )
    return f"filter({toks}, x -> length(x) > 0)"


def stopword_sql_list() -> str:
    """The stopword set as a DuckDB IN-list literal, for oracle SQL."""
    return "(" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + ")"


def analyze_sql(expr: str, stopwords: bool = True) -> str:
    """DuckDB fragment producing the same analyzed token list for a text
    expression — keeps oracle tokenization bit-identical to Spark's."""
    base = f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), x -> len(x) > 0"
    if stopwords:
        return base + f" AND x NOT IN {stopword_sql_list()})"
    return base + ")"
