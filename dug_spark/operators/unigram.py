"""Distributed unigram-LM subword tokenizer (SentencePiece's second
algorithm) — training and application.

Unigram language-model tokenization per Kudo 2018 ("Subword
Regularization", ACL; the `unigram` mode of the public SentencePiece
toolkit): model a word as a sequence of independent subword pieces,
fit piece probabilities, and segment by the maximum-likelihood piece
sequence (Viterbi over the substring lattice).  Together with
``operators/bpe.py`` this completes the two standard subword trainers a
training-data pipeline needs; the reference has no tokenizer at all.

Deliberate simplifications, stated up front (both mirrored exactly by
the pure-Python oracle in functions/pyoracle.py, so every deviation is
still hash-verified):

- Hard (Viterbi) EM instead of soft forward-backward EM — the expected
  count of a piece is its count along each word's single best
  segmentation.  Deterministic; SentencePiece itself offers Viterbi
  segmentation, and hard EM is the standard cheap variant.
- Pruning keeps the top ``vocab_size`` pieces by expected count
  (count desc, piece asc) instead of the exact likelihood-loss ranking;
  single characters are never pruned (coverage guarantee).
- Whitespace tokenization, per-word lattices (matches build_vocab /
  bpe): no cross-word pieces.

Scale shape (the 10^12-document story):

- The corpus is touched EXACTLY ONCE — ``bpe.word_counts``'s
  token-explode + groupBy(word) with map-side partial aggregation.
  Everything after runs on the WORD table (dimension-sized, capped).
- Seed-vocabulary generation, and every EM round, are ONE mapInPandas
  pass over the word table (broadcast piece-prob dict in, per-word
  Python DP inside the Arrow batch) followed by ONE piece-keyed
  aggregate; the driver collects only the VOCAB-sized count table per
  round (same dimension-bounded-collect contract as the CCNet LM count
  tables in operators/lm.py).
- ``unigram_encode`` is MAP-ONLY over the corpus: the final (piece →
  logp) table broadcasts into mapInPandas; each Arrow batch memoizes
  word → pieces so Viterbi runs once per DISTINCT word per batch.

Ties in the Viterbi DP break toward the LONGER piece ending at the
boundary (then lexicographically) — fixed identically here and in the
mirror, so segmentations are deterministic cross-engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dug_spark.operators.bpe import word_counts

VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("logp", T.DoubleType(), False),
    ]
)

_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("c", T.DoubleType(), False),
    ]
)

# log-prob assigned to a character absent from the vocabulary when
# encoding (training never needs it: single chars are never pruned)
UNK_LOGP = -100.0


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Maximum-likelihood segmentation of ``word`` into vocab pieces.
    DP over end positions; ties break toward the longer final piece.
    Characters not in the vocab are emitted as single-char pieces at
    UNK_LOGP (encode-time fallback only)."""
    n = len(word)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[int] = [0] * (n + 1)
    for end in range(1, n + 1):
        lo = max(0, end - max_len)
        # iterate starts ascending ⇒ on equal score the LAST write wins…
        # so prefer longer pieces by iterating starts ascending and
        # accepting strictly-better OR equal-score-with-earlier-start
        for start in range(lo, end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = UNK_LOGP
                else:
                    continue
            score = best[start] + lp
            if score > best[end] or (
                score == best[end] and start < back[end]
            ):
                best[end] = score
                back[end] = start
    out: list[str] = []
    end = n
    while end > 0:
        start = back[end]
        out.append(word[start:end])
        end = start
    return out[::-1]


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    min_count: int = 2,
    max_words: int = 50_000,
) -> DataFrame:
    """Train the unigram-LM piece vocabulary; returns (piece, logp)
    sorted by (logp desc, piece asc).  One corpus pass (word_counts);
    per EM round one broadcast + one mapInPandas over the word table +
    one piece-keyed aggregate whose result (vocab-sized) is collected.
    Prune rounds shrink the piece set by ``shrink``× (never below
    vocab_size, never dropping single chars) until vocab_size holds."""
    spark = df.sparkSession
    wc = word_counts(
        df, text_col=text_col, min_count=min_count, max_words=max_words
    ).localCheckpoint(eager=True)

    # seed vocabulary: distributed substring counts (one explode pass
    # over the word table), then the vocab-sized top-N collect
    def _substr_counts(batches):
        import pandas as pd

        for pdf in batches:
            counts: dict[str, float] = {}
            for w, n in zip(pdf["word"], pdf["n"]):
                for i in range(len(w)):
                    for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                        p = w[i:j]
                        counts[p] = counts.get(p, 0.0) + float(n)
            yield pd.DataFrame(
                {
                    "piece": pd.Series(list(counts), dtype="object"),
                    "c": pd.Series(list(counts.values()), dtype="float64"),
                }
            )

    sub = (
        wc.mapInPandas(_substr_counts, _COUNTS_SCHEMA)
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
    )
    chars = {
        r["piece"]: r["c"]
        for r in sub.where(F.length("piece") == 1).collect()
    }
    multi_rows = (
        sub.where(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(max(0, seed_size - len(chars)))
        .collect()
    )
    keep = dict(chars)
    keep.update({r["piece"]: r["c"] for r in multi_rows})
    total = sum(keep.values())
    logp = {p: math.log(c / total) for p, c in keep.items()}

    # EM + prune rounds on the word table
    while True:
        for _ in range(em_iters):
            logp = _em_round(spark, wc, logp, max_piece_len)
        if len(logp) <= vocab_size:
            break
        n_next = max(vocab_size, int(len(logp) * shrink))
        if n_next >= len(logp):
            break
        # prune by expected count ≙ prob (count desc == logp desc after
        # renorm), never dropping single chars
        singles = [(p, lp) for p, lp in logp.items() if len(p) == 1]
        multis = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[: max(0, n_next - len(singles))]
        kept = dict(singles)
        kept.update(dict(multis))
        # renormalize in prob space; SORTED sum — exp values are
        # irrational so float-sum order matters, and dict insertion
        # order here follows nondeterministic collect order (every
        # other sum in this trainer is integer-exact and order-free)
        z = sum(math.exp(lp) for _, lp in sorted(kept.items()))
        logp = {p: lp - math.log(z) for p, lp in kept.items()}

    rows = sorted(logp.items(), key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        [(p, float(lp)) for p, lp in rows], VOCAB_SCHEMA
    )


def _em_round(
    spark, wc: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """One hard-EM round: Viterbi-segment every distinct word under the
    broadcast model, sum piece counts weighted by word frequency
    (piece-keyed aggregate), renormalize.  Driver traffic = the
    vocab-sized count table."""
    b = spark.sparkContext.broadcast(logp)

    def _counts(batches):
        import pandas as pd

        model = b.value
        for pdf in batches:
            counts: dict[str, float] = {}
            for w, n in zip(pdf["word"], pdf["n"]):
                for piece in viterbi_segment(w, model, max_piece_len):
                    counts[piece] = counts.get(piece, 0.0) + float(n)
            yield pd.DataFrame(
                {
                    "piece": pd.Series(list(counts), dtype="object"),
                    "c": pd.Series(list(counts.values()), dtype="float64"),
                }
            )

    agg = (
        wc.mapInPandas(_counts, _COUNTS_SCHEMA)
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    counts = {r["piece"]: r["c"] for r in agg}
    # pieces never used keep a floor count of 0 and drop out of the
    # model — except single chars, which keep a minimal probability so
    # coverage never breaks
    total = sum(counts.values())
    out: dict[str, float] = {}
    for p, lp in logp.items():
        c = counts.get(p, 0.0)
        if c > 0:
            out[p] = math.log(c / total)
        elif len(p) == 1:
            out[p] = math.log(0.5 / total)  # Laplace-style floor
    return out


ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("pieces", T.ArrayType(T.StringType()), False),
        T.StructField("n_pieces", T.IntegerType(), False),
    ]
)


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 8,
) -> DataFrame:
    """Map-only corpus encoding: (doc_id, pieces, n_pieces) by Viterbi
    under the broadcast (piece, logp) vocabulary; per-batch word → pieces
    memoization so DP runs once per distinct word per Arrow batch.
    Unknown characters fall back to single-char pieces at UNK_LOGP."""
    spark = df.sparkSession
    model = {r["piece"]: r["logp"] for r in vocab.collect()}
    b = spark.sparkContext.broadcast(model)
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def _encode(batches):
        import pandas as pd

        m = b.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, pieces_col, n_col = [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                pieces: list[str] = []
                for w in (t or "").split():
                    got = memo.get(w)
                    if got is None:
                        got = viterbi_segment(w, m, max_piece_len)
                        memo[w] = got
                    pieces.extend(got)
                ids.append(int(i))
                pieces_col.append(pieces)
                n_col.append(len(pieces))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pieces": pd.Series(pieces_col, dtype="object"),
                    "n_pieces": pd.Series(n_col, dtype="int32"),
                }
            )

    return src.mapInPandas(_encode, ENCODED_SCHEMA)
