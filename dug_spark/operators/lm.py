"""Statistical language-model curation ops: CCNet-style perplexity
filtering and shard-local training-sequence packing.

Not in the reference (Dug never scores fluency or packs tokens); these
are the two steps a training-data pipeline runs between curation
(operators/curate.py) and tokenizer output (textstats.encode_with_vocab):

- ``perplexity_filter`` — the CCNet pass (Wenzek et al. 2020 §4.3): an
  n-gram LM trained on a trusted reference corpus scores every candidate
  document; documents are bucketed head/middle/tail by perplexity
  cutoffs derived from the reference corpus itself.

- ``pack_sequences`` — greedy token-budget packing of documents into
  fixed-length training sequences, performed independently inside
  deterministic shards (the formulation that parallelizes: real packing
  jobs pack within file shards, never corpus-globally).

Scale shape:
- The reference/LM side is dimension-sized (CCNet trains on Wikipedia,
  ~10^7 docs) against a 10^12-doc corpus: its count tables are collected
  once on the driver (O(vocab), the same class as the NER dictionary
  broadcast in operators/annotate.py) and broadcast; scoring is a
  map-only ``mapInPandas`` over Arrow batches — the corpus never
  shuffles.
- Packing shuffles the corpus ONCE, keyed by shard, then runs an O(shard)
  greedy inside ``applyInPandas``.  ``n_shards`` is the parallelism knob:
  pick it so a shard's (id, token-count) rows fit executor memory —
  at 10^12 docs that is n_shards ≈ 10^5-10^6, each shard a normal
  training-data output shard.

Both ops are exactly reproducible in pure Python (functions/pyoracle
mirrors) so the driver gets full VALUES oracles; the per-token scoring
loop runs over Arrow batches (the documented Pandas-UDF path — the same
per-doc token loop any KenLM scorer runs), never as a per-row Python UDF
inside a relational plan.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[^a-z0-9]+")

# interpolation weight of the bigram MLE against the add-one unigram
# fallback; 0.9 is the conventional choice for a 2-gram Jelinek-Mercer mix
DEFAULT_LAMBDA = 0.9

BOS = "<s>"


def _py_tokens(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split((text or "").lower()) if t]


def _sql_tokens(text_col: str):
    """Same tokenizer as ``_py_tokens`` in codegen expressions (used for
    the packing token counts so Spark and the oracle agree exactly)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )


def _tokenized(ref: DataFrame, text_col: str) -> DataFrame:
    """One-column (toks array<string>) frame over the reference corpus —
    the shared input of every count table.  Callers that train several
    orders localCheckpoint this once so the ref is scanned + tokenized a
    single time instead of once per table (round 6, guide §2.4)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )
    return ref.select(toks.alias("toks")).where(F.size("toks") > 0)


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text", toks_df: DataFrame | None = None
) -> tuple[dict[str, int], dict[tuple[str, str], int], int]:
    """Count tables for an interpolated bigram LM from a reference corpus:
    (unigram counts, bigram counts keyed by (context, word), total token
    count).  Each document is the sequence ``<s> w1 .. wn`` — bigram
    contexts include ``<s>`` so the first word of a document is modelled.

    Plan: ONE explode→groupBy shuffle per table (partial aggregation
    collapses hot n-grams map-side), then a driver collect of the
    dimension-sized result.  The reference corpus is trusted/curated and
    small relative to the scoring corpus by construction (CCNet: Wikipedia
    vs Common Crawl) — the collect is O(vocab + bigram types), not
    O(corpus).  ``toks_df`` short-circuits tokenization with a shared
    pre-tokenized frame (see ``_tokenized``)."""
    with_toks = toks_df if toks_df is not None else _tokenized(ref, text_col)
    uni_rows = (
        with_toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    seq = F.concat(F.array(F.lit(BOS)), F.col("toks"))
    bi = F.transform(
        F.sequence(F.lit(0), F.size(seq) - 2),
        lambda i: F.struct(
            F.element_at(seq, i + 1).alias("c"),
            F.element_at(seq, i + 2).alias("w"),
        ),
    )
    bi_rows = (
        with_toks.select(F.explode(bi).alias("b"))
        .select("b.c", "b.w")
        .groupBy("c", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    unigrams = {r["w"]: r["n"] for r in uni_rows}
    bigrams = {(r["c"], r["w"]): r["n"] for r in bi_rows}
    total = sum(unigrams.values())
    return unigrams, bigrams, total


def train_trigram_lm(
    ref: DataFrame,
    text_col: str = "text",
    prune_trigram: int = 2,
    toks_df: DataFrame | None = None,
    with_ledger: bool = True,
) -> tuple[dict, dict]:
    """Trigram count tables with COUNT-THRESHOLD PRUNING (the CCNet-shape
    upgrade toward its KenLM 5-gram: Wenzek et al. 2020 §4.3 score with a
    pruned n-gram LM; count cutoffs are the standard n-gram pruning that
    keeps a web-scale table broadcastable — KenLM's --prune).  Returns
    ``(tables, ledger)`` where tables =
    {trigrams: {(u,v,w): n}, ctx3: {(u,v): n}} and the ledger records
    kept/dropped type counts so the broadcast size is observable.

    Sequences are double-BOS padded (``<s> <s> w1 ..``) so the first two
    words are modelled.  Pruning happens IN THE AGGREGATION (filter on
    the counted table before collect) — the driver never sees the
    unpruned tail.  ctx3 keeps every context with total ≥ the trigram
    threshold, which covers all kept trigrams' denominators (a kept
    trigram's context total is ≥ its own count) while staying equally
    bounded; denominators remain UNPRUNED totals, so pruned probability
    mass is genuinely given up to the backoff terms rather than
    renormalized away.

    ``toks_df`` shares a pre-tokenized frame (see ``_tokenized``);
    ``with_ledger=False`` skips the unpruned-type count — an extra
    aggregation-output pass whose only consumer is the ledger — for
    callers that discard it (``perplexity_filter``)."""
    with_toks = toks_df if toks_df is not None else _tokenized(ref, text_col)
    seq = F.concat(F.array(F.lit(BOS), F.lit(BOS)), F.col("toks"))
    tri = F.transform(
        F.sequence(F.lit(0), F.size(seq) - 3),
        lambda i: F.struct(
            F.element_at(seq, i + 1).alias("c2"),
            F.element_at(seq, i + 2).alias("c1"),
            F.element_at(seq, i + 3).alias("w"),
        ),
    )
    # the counted table is read up to three times (kept rows, context
    # totals, ledger type count) — materialize it ONCE so the trigram
    # explode+aggregate does not replay per consumer (round 6; was 3
    # full passes, the dominant cost of training)
    tri_counts = (
        with_toks.select(F.explode(tri).alias("t"))
        .groupBy("t.c2", "t.c1", "t.w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    # context totals ride on the counted table (no second ref scan)
    ctx_counts = tri_counts.groupBy("c2", "c1").agg(F.sum("n").alias("n"))
    kept_rows = tri_counts.where(F.col("n") >= prune_trigram).collect()
    ctx_rows = ctx_counts.where(F.col("n") >= prune_trigram).collect()
    tables = {
        "trigrams": {(r["c2"], r["c1"], r["w"]): r["n"] for r in kept_rows},
        "ctx3": {(r["c2"], r["c1"]): r["n"] for r in ctx_rows},
    }
    if not with_ledger:
        return tables, None
    n_types = tri_counts.count()
    ledger = {
        "trigram_types": n_types,
        "trigrams_kept": len(kept_rows),
        "trigrams_pruned": n_types - len(kept_rows),
        "ctx3_kept": len(ctx_rows),
        "prune_trigram": prune_trigram,
    }
    return tables, ledger


def context_totals(
    unigrams: dict[str, int], bigrams: dict[tuple[str, str], int]
) -> dict[str, int]:
    """count(c) per bigram context: the unigram count for word contexts
    (the standard deficient-MLE shortcut — doc-final words have no
    successor, so per-context bigram mass sums to slightly under 1) and
    the number of reference documents for the ``<s>`` context.  Computed
    once after training, O(|bigrams|)."""
    ctx = dict(unigrams)
    ctx[BOS] = sum(n for (c, _w), n in bigrams.items() if c == BOS)
    return ctx


def score_tokens(
    tokens: list[str],
    unigrams: dict[str, int],
    bigrams: dict[tuple[str, str], int],
    total: int,
    ctx: dict[str, int],
    lam: float = DEFAULT_LAMBDA,
) -> float:
    """Cross-entropy (bits/token) of a token sequence under the
    interpolated bigram LM:

        P(w|c) = lam * count(c,w)/count(c)  +  (1-lam) * P1(w)
        P1(w)  = (count(w) + 1) / (total + V + 1)     (add-one; V+1 leaves
                                                       mass for unseen w)

    with count(c) from ``context_totals``.  Deterministic double
    arithmetic, summed in token order — functions/pyoracle.lm_rows
    reproduces it bit-for-bit."""
    if not tokens:
        return 0.0
    vocab = len(unigrams)
    h = 0.0
    prev = BOS
    for w in tokens:
        cn = ctx.get(prev, 0)
        p_bi = (bigrams.get((prev, w), 0) / cn) if cn else 0.0
        p_uni = (unigrams.get(w, 0) + 1) / (total + vocab + 1)
        h -= math.log2(lam * p_bi + (1.0 - lam) * p_uni)
        prev = w
    return h / len(tokens)


# trigram weight of the Jelinek-Mercer mix; the remaining mass backs off
# into the bigram/unigram interpolation above
DEFAULT_LAMBDA3 = 0.6


def score_tokens_trigram(
    tokens: list[str],
    unigrams: dict[str, int],
    bigrams: dict[tuple[str, str], int],
    total: int,
    ctx: dict[str, int],
    tri_tables: dict,
    lam: float = DEFAULT_LAMBDA,
    lam3: float = DEFAULT_LAMBDA3,
) -> float:
    """Cross-entropy (bits/token) under the pruned interpolated trigram:

        P(w|u,v) = lam3·count(u,v,w)/count(u,v)
                 + (1-lam3)·[ lam·P2(w|v) + (1-lam)·P1(w) ]

    with the trigram term 0 when the (pruned) tables miss the n-gram or
    its context — Jelinek-Mercer interpolation, so pruned mass falls
    through to the bigram/unigram backoff instead of being renormalized."""
    if not tokens:
        return 0.0
    vocab = len(unigrams)
    tri = tri_tables["trigrams"]
    ctx3 = tri_tables["ctx3"]
    h = 0.0
    prev2, prev1 = BOS, BOS
    for w in tokens:
        cn3 = ctx3.get((prev2, prev1), 0)
        p_tri = (tri.get((prev2, prev1, w), 0) / cn3) if cn3 else 0.0
        cn = ctx.get(prev1, 0)
        p_bi = (bigrams.get((prev1, w), 0) / cn) if cn else 0.0
        p_uni = (unigrams.get(w, 0) + 1) / (total + vocab + 1)
        h -= math.log2(
            lam3 * p_tri + (1.0 - lam3) * (lam * p_bi + (1.0 - lam) * p_uni)
        )
        prev2, prev1 = prev1, w
    return h / len(tokens)


def perplexity_filter(
    df: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = DEFAULT_LAMBDA,
    cutoff_ref: DataFrame | None = None,
    order: int = 2,
    lam3: float = DEFAULT_LAMBDA3,
    prune_trigram: int = 2,
) -> DataFrame:
    """Score every document of ``df`` with a bigram LM trained on ``ref``
    and bucket it head/middle/tail by the reference corpus's own
    perplexity tertiles (the CCNet §4.3 protocol: cutoffs come from the
    trusted corpus, so bucketing is a broadcast constant — never a
    corpus-wide sort/percentile at scoring time).

    Adds ``n_tokens``, ``cross_entropy`` and ``perplexity`` (bits/token
    and 2^H, ROUND(6)), and ``ppl_bucket`` ∈ {head, middle, tail, empty}.
    Map-only over the corpus: the LM tables and the two cutoffs ride one
    broadcast into ``mapInPandas``.

    ``cutoff_ref`` (default: ``ref`` itself, the CCNet protocol) is the
    slice whose score tertiles become the bucket cutoffs.  At Wikipedia
    scale in-train calibration is fine; with a SMALL reference the LM
    memorizes it and in-train tertiles push nearly everything to tail —
    pass a held-out slice here to calibrate on out-of-train scores.

    ``order=3`` (round 5) upgrades to the pruned interpolated trigram
    (train_trigram_lm / score_tokens_trigram — the step toward CCNet's
    actual pruned KenLM): same protocol, the trigram tables join the one
    broadcast, and ``prune_trigram`` bounds them.

    Round-6 plan shape (guide §4.1/§2.4): training tokenizes the
    reference ONCE into a checkpointed (toks) frame shared by the
    unigram/bigram/trigram count tables (was: one scan+tokenize per
    table) and skips the ledger-only type count; scoring is a scalar
    Arrow pandas UDF over the TEXT COLUMN ALONE — the document's other
    columns never cross the JVM↔Python boundary (the old mapInPandas
    round-tripped every column, text included, both ways).  Per-doc
    arithmetic is byte-identical (same loop, same floats)."""
    from pyspark.sql.functions import pandas_udf

    if order not in (2, 3):
        raise ValueError(f"order must be 2 or 3, got {order}")
    toks_df = _tokenized(ref, text_col).localCheckpoint(eager=False)
    unigrams, bigrams, total = train_bigram_lm(ref, text_col, toks_df=toks_df)
    ctx = context_totals(unigrams, bigrams)
    tri_tables = (
        train_trigram_lm(
            ref,
            text_col,
            prune_trigram=prune_trigram,
            toks_df=toks_df,
            with_ledger=False,
        )[0]
        if order == 3
        else None
    )

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (unigrams, bigrams, total, ctx, lam, tri_tables, lam3)
    )

    @pandas_udf("n_tokens int, cross_entropy double, perplexity double")
    def lm_score(texts: pd.Series) -> pd.DataFrame:
        uni, bi, tot, cx, lmbd, tri, l3 = bc.value
        ns, hs, ps = [], [], []
        for text in texts:
            tk = _py_tokens(text)
            if tri is None:
                h = score_tokens(tk, uni, bi, tot, cx, lmbd)
            else:
                h = score_tokens_trigram(tk, uni, bi, tot, cx, tri, lmbd, l3)
            ns.append(len(tk))
            hs.append(h)
            ps.append(2.0**h)
        return pd.DataFrame(
            {
                "n_tokens": pd.Series(ns, dtype="int32"),
                "cross_entropy": pd.Series(hs, dtype="float64"),
                "perplexity": pd.Series(ps, dtype="float64"),
            }
        )

    def _scored(frame: DataFrame) -> DataFrame:
        """frame + (n_tokens, cross_entropy, perplexity) via the broadcast
        LM — the shared scorer for both the calibration slice and the
        corpus (bit-identical by construction).  Only ``text_col`` feeds
        the ArrowEvalPython node; everything else stays in the JVM."""
        return frame.withColumn("_lm", lm_score(F.col(text_col))).select(
            *frame.columns,
            F.col("_lm.n_tokens").alias("n_tokens"),
            F.col("_lm.cross_entropy").alias("cross_entropy"),
            F.col("_lm.perplexity").alias("perplexity"),
        )

    # cutoffs: score the calibration docs DISTRIBUTED with the same
    # scorer, then collect ONLY the perplexity doubles (8 bytes/doc —
    # ~80 MB at the CCNet 10^7-doc Wikipedia scale, vs tens of GB for
    # the full texts) and take exact tertiles of the sorted list on the
    # driver.  Exact index selection keeps the cutoffs deterministic
    # (approxQuantile would not); the scoring cost — the real work —
    # runs on the cluster.
    calib = cutoff_ref if cutoff_ref is not None else ref
    ref_ppl = sorted(
        r[0]
        for r in _scored(calib.select(text_col))
        .where(F.col("n_tokens") > 0)
        .select("perplexity")
        .collect()
    )
    if ref_ppl:
        cut_head = ref_ppl[(len(ref_ppl) - 1) // 3]
        cut_mid = ref_ppl[(2 * (len(ref_ppl) - 1)) // 3]
    else:  # degenerate empty reference: everything is tail
        cut_head = cut_mid = float("-inf")

    # bucket assignment is a plain column expression over the scored
    # corpus — the two cutoffs are literals, no second Python pass
    scored = _scored(df).withColumn(
        "ppl_bucket",
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("perplexity") <= F.lit(cut_head), F.lit("head"))
        .when(F.col("perplexity") <= F.lit(cut_mid), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return scored.withColumn(
        "cross_entropy", F.round("cross_entropy", 6)
    ).withColumn("perplexity", F.round("perplexity", 6))


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget packing of documents into training sequences,
    independently per deterministic shard (``doc_id % n_shards``).

    Within a shard, documents are visited in ``id_col`` order and a
    sequence closes when the next document would overflow ``budget``; a
    single document longer than the budget gets a sequence of its own
    with ``oversize = true`` (real pipelines then split it downstream).
    Output: one row per document — (shard, seq_id, token offset within the sequence,
    n_tokens, oversize) — the manifest a writer needs to materialize
    packed token files.

    Plan: ONE shuffle keyed by shard (Exchange → applyInPandas); the
    greedy is O(shard rows) and runs entirely inside the group.  Shards
    are the unit of output parallelism AND the memory bound: only the
    (id, count) pairs of one shard are ever held in one pandas frame."""
    import pandas as pd

    counts = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(_sql_tokens(text_col)).alias("n_tokens"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
    )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("seq_id", T.IntegerType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("tok_offset", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        seq, used = 0, 0
        seqs, offs, overs = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                seq, used = seq + 1, 0
            seqs.append(seq)
            offs.append(used)
            overs.append(n > budget)
            used += n
            if used >= budget:  # exactly-full or oversize closes the seq
                seq, used = seq + 1, 0
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int64"),
                "seq_id": pd.Series(seqs, dtype="int32", index=pdf.index),
                "doc_id": pdf["doc_id"].astype("int64"),
                "tok_offset": pd.Series(offs, dtype="int32", index=pdf.index),
                "n_tokens": pdf["n_tokens"].astype("int32"),
                "oversize": pd.Series(overs, dtype="bool", index=pdf.index),
            }
        )

    return counts.groupBy("shard").applyInPandas(pack, schema=out_schema)
