"""Model-based quality classification: distributed multinomial Naive
Bayes over the token stream, trained in ONE corpus aggregation and
applied map-only via a broadcast weight table.

Not in the reference (Dug filters by fixed predicates only); this is the
GPT-3 / PaLM-style "quality classifier" curation step (Brown et al. 2020
app. A: a linear classifier trained on a trusted seed corpus vs raw crawl,
used to keep crawl documents that look like the seed).  CCNet (Wenzek et
al. 2020) plays the same trick with an LM — operators/lm.py implements
that path; this module is the discriminative sibling.

Why Naive Bayes and not SGD-trained logistic regression: NB's MLE is a
pure counting problem, so training is ONE groupBy over (label, token) —
no iterations, no driver-side optimizer state beyond the vocab-bounded
count table, and bit-for-bit reproducible.  (NB with per-token
log-likelihood-ratio weights IS a linear classifier at apply time —
the fastText baseline formulation.)

Model:
    w(t)  = ln( (c_pos(t)+α) / (T_pos+α·V) ) − ln( (c_neg(t)+α) / (T_neg+α·V) )
    bias  = ln(N_pos / N_neg)
    score(doc) = bias + Σ_{t ∈ doc ∩ vocab} count_t · w(t);  keep ⇔ score > 0

Scale shape:
- Vocabulary: top-``vocab_size`` tokens by corpus count (deterministic
  count-desc/token-asc tie-break) — TakeOrdered, never a full sort.
- Training: tokenize → explode → ONE (label, token) aggregation with
  map-side partial combine; the result is vocab-bounded (≤ 2·V rows) and
  collected to the driver like the NER dictionary (operators/annotate.py)
  and the LM count tables (operators/lm.py).
- Apply: broadcast dict + ``mapInPandas`` — the corpus NEVER shuffles;
  per-doc scoring is a sequential float64 fold (deterministic).

The whole model is relational, so the driver gets a full DuckDB oracle
(token counting, smoothing and the per-doc sum re-derived in SQL);
scores round to 4 decimals — two engines sum the per-token terms in
different orders (same reasoning as the PageRank oracle's rounding).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# shared with the LM family: lowercase, split on non-alphanumeric
from .lm import _py_tokens, _sql_tokens


def train_nb(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    vocab_size: int = 512,
    alpha: float = 1.0,
) -> tuple[dict[str, float], float]:
    """Train multinomial NB on ``labeled`` (``label_col`` boolean: True =
    trusted/positive).  Returns ``(weights, bias)`` — ``weights`` maps
    token → log-likelihood ratio w(t) for the top-``vocab_size`` vocabulary,
    ``bias`` is the log prior ratio.  Driver memory is O(vocab_size): the
    only collects are the vocab-bounded count table and two one-row
    aggregates."""
    toks = labeled.select(
        F.col(label_col).cast("boolean").alias("y"),
        F.explode(_sql_tokens(text_col)).alias("token"),
    )
    # ONE tokenize + token-keyed aggregation carrying BOTH per-class
    # counts; the deterministic top-V vocabulary (count desc, token asc)
    # is the same TakeOrdered over total = c_pos + c_neg, so vocabulary
    # selection and class counts ride a single corpus pass instead of
    # two (the old plan tokenized once for the vocab TakeOrdered and
    # again for the vocab-restricted (label, token) aggregation).
    # The collect stays vocab-bounded (top-V rows only).
    vocab_rows = (
        toks.groupBy("token")
        .agg(
            F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("cp"),
            F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("cn"),
        )
        .orderBy(F.desc(F.col("cp") + F.col("cn")), F.asc("token"))
        .limit(vocab_size)
        .collect()
    )
    vocab = {r["token"] for r in vocab_rows}
    v = len(vocab)
    c_pos = {r["token"]: r["cp"] for r in vocab_rows if r["cp"]}
    c_neg = {r["token"]: r["cn"] for r in vocab_rows if r["cn"]}
    t_pos = sum(c_pos.values())
    t_neg = sum(c_neg.values())
    prior = labeled.groupBy(F.col(label_col).cast("boolean").alias("y")).count().collect()
    n_pos = sum(r["count"] for r in prior if r["y"])
    n_neg = sum(r["count"] for r in prior if not r["y"])
    if n_pos == 0 or n_neg == 0:
        raise ValueError("train_nb needs both classes present")
    weights = {
        t: (
            math.log((c_pos.get(t, 0) + alpha) / (t_pos + alpha * v))
            - math.log((c_neg.get(t, 0) + alpha) / (t_neg + alpha * v))
        )
        for t in vocab
    }
    return weights, math.log(n_pos / n_neg)


def nb_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float,
    text_col: str = "text",
) -> DataFrame:
    """Map-only apply: appends ``nb_score`` (double, round 4) and
    ``nb_keep`` (score > 0).  The weight dict is vocab-bounded and ships
    inside the serialized closure (same broadcast class as the NER
    dictionary); docs with no vocab token score exactly ``bias``."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("nb_score", T.DoubleType()),
            T.StructField("nb_keep", T.BooleanType()),
        ]
    )
    w = dict(weights)
    b = float(bias)

    def score(batches):
        for pdf in batches:
            scores = []
            for text in pdf[text_col]:
                s = b
                for t in _py_tokens(text or ""):
                    lw = w.get(t)
                    if lw is not None:
                        s += lw
                scores.append(round(s, 4))
            pdf = pdf.copy()
            pdf["nb_score"] = scores
            pdf["nb_keep"] = [s > 0 for s in scores]
            yield pdf

    return df.mapInPandas(score, schema=out_schema)


def quality_classifier(
    corpus: DataFrame,
    labeled: DataFrame | None = None,
    text_col: str = "text",
    label_col: str = "label",
    vocab_size: int = 512,
    alpha: float = 1.0,
) -> DataFrame:
    """Train-and-apply composition.  ``labeled`` defaults to the corpus
    itself with ``label_col`` already present (self-training on weak
    labels — e.g. lang='en' as the trusted class, or the Gopher keep
    verdict); a real deployment passes a trusted seed sample instead.
    The corpus side stays map-only either way."""
    if labeled is None:
        labeled = corpus
    weights, bias = train_nb(
        labeled, text_col=text_col, label_col=label_col,
        vocab_size=vocab_size, alpha=alpha,
    )
    return nb_score(corpus, weights, bias, text_col=text_col)


def evaluate_classifier(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Per-group evaluation of a boolean classifier: confusion counts +
    precision / recall / F1 / accuracy — ONE conditional-sum aggregate
    over the verdict table (map-side partials, |groups| rows out), the
    audit every model-based curation gate (quality_classifier,
    lm_perplexity buckets) needs before its threshold goes to production.

    NULL labels/predictions are excluded.  Metrics are NULL (not 0/0)
    when a denominator is empty — a group with no predicted positives
    has undefined precision, and hiding that as 0 misreads the audit.
    Ratios round 6 for cross-engine hash comparison.
    """
    lab = F.col(label_col).cast("boolean")
    pred = F.col(pred_col).cast("boolean")
    base = df.where(lab.isNotNull() & pred.isNotNull())
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))
    groups = [group_col] if group_col else []
    agged = base.groupBy(*groups).agg(
        cnt(lab & pred).alias("tp"),
        cnt(~lab & pred).alias("fp"),
        cnt(lab & ~pred).alias("fn"),
        cnt(~lab & ~pred).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    prec = tp / F.nullif(tp + fp, F.lit(0))
    rec = tp / F.nullif(tp + fn, F.lit(0))
    f1 = 2 * prec * rec / F.nullif(prec + rec, F.lit(0.0))
    acc = (tp + tn) / F.nullif(tp + fp + fn + tn, F.lit(0))
    return agged.select(
        *groups,
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(acc, 6).alias("accuracy"),
    )
