"""Text analysis operators: language-ID, quality scoring, token counting,
rolling-hash fingerprinting.

Not in the reference (Dug's only text math is lower() + chunking); required
as first-class ops for a web-scale training-data pipeline.  Everything here
is built-in column expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "you"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def _tokens(text_col: str):
    return F.split(text_col, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (≈ chars/4, the
    common 4-chars-per-token heuristic) per row."""
    toks = _tokens(text_col)
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_subwords",
        F.ceil(F.length(text_col) / F.lit(4.0)).cast("long"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None
) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score ∈ [0,1] (Gopher-rule-style gates, deterministic)."""
    stop = stopwords or LANG_PROFILES["en"]
    toks = _tokens(text_col)
    n = F.size(toks)
    sumlen = F.aggregate(F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x)
    stop_n = F.size(F.filter(toks, lambda x: x.isin(*stop)))
    punct_n = F.length(text_col) - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    out = (
        df.withColumn("n_tokens", n)
        .withColumn("avg_token_len", F.round(sumlen.cast("double") / n, 6))
        .withColumn("stopword_ratio", F.round(stop_n.cast("double") / n, 6))
        .withColumn("punct_ratio", F.round(punct_n.cast("double") / F.length(text_col), 6))
    )
    gates = (
        F.when(F.col("n_tokens").between(10, 100000), 0.25).otherwise(0.0)
        + F.when(F.col("avg_token_len").between(2.0, 12.0), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.01, 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
    )
    return out.withColumn("quality", gates)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language stopword hit
    ratios; 'unk' when the best ratio is below 1%."""
    toks = _tokens(text_col)
    n = F.size(toks)
    def _ratio(words):
        # nb: the higher-order-function bridge passes a Column for every
        # lambda parameter, so the word list must be a closure, not a
        # default argument
        return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("double") / n

    ratios = {lang: _ratio(words) for lang, words in LANG_PROFILES.items()}
    best_lang = F.lit("unk")
    best_ratio = F.lit(0.01)
    # deterministic tie-break: languages evaluated in sorted order, strict >
    for lang in sorted(ratios):
        cond = ratios[lang] > best_ratio
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(cond, ratios[lang]).otherwise(best_ratio)
    return df.withColumn("pred_lang", best_lang)


def fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8
) -> DataFrame:
    """Rolling-hash document fingerprint: min/max xxhash64 over sliding
    word windows (winnowing-style) + full-content md5."""
    toks = _tokens(text_col)
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return (
        df.withColumn("fp_md5", F.md5(F.encode(text_col, "utf-8")))
        .withColumn("fp_min", F.array_min(windows))
        .withColumn("fp_max", F.array_max(windows))
    )
