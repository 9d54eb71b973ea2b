"""Distributed BPE subword-tokenizer training and application.

Byte-Pair Encoding for subwords per Sennrich, Haddow & Birch 2016
("Neural Machine Translation of Rare Words with Subword Units", ACL —
the public subword-nmt algorithm): start from the corpus word-frequency
table with each word split into characters plus an end-of-word marker
(``'word' → w o r d</w>``), then repeatedly merge the most frequent
adjacent symbol pair.  Not in the reference (Dug has no tokenizer
training); required for a training-data pipeline — this is the step that
turns ``build_vocab``'s word table into an open-vocabulary subword
tokenizer.

Scale shape (the 10^12-document story):

- The corpus is touched EXACTLY ONCE: one token-explode + groupBy(word)
  shuffle with map-side partial aggregation produces the word-frequency
  table (``word_counts`` — same plan class as textstats.build_vocab).
  Hot words collapse map-side, so a 10^11-occurrence stopword reaches
  the shuffle as one row per upstream partition.
- Training then iterates over the WORD table only — dimension-sized
  (``max_words`` caps it, deterministic (count desc, word asc) order),
  never the corpus.  Each round is one distributed pair-count
  (explode adjacent symbol pairs weighted by word count → groupBy pair,
  pure JVM: slice/zip_with, no Python) of which the driver collects only
  the TOP CANDIDATE SLICE (``4·batch`` rows) — driver state is the merge
  list, vocab-sized, never the table.
- ``batch`` merges land per round (batched merge rounds), cutting the
  round count — and thus job-launch + shuffle overhead — by ``batch``×.
  Within a round only SYMBOL-DISJOINT pairs are accepted: applying one
  cannot change the count of another already-selected pair (merging
  (a,b)→ab only perturbs pairs adjacent to an occurrence, i.e. pairs
  containing a or b; pairs over a freshly merged symbol first appear in
  the NEXT round's recount).  With ``batch=1`` this is EXACTLY the
  sequential Sennrich procedure.  With ``batch>1`` it is the standard
  distributed approximation: a pair created mid-batch cannot be selected
  until the next round even if its count would out-rank a later in-batch
  pick — documented deviation, controlled by the knob.
- Word-table lineage is cut with ``localCheckpoint`` every
  ``checkpoint_every`` rounds (node-sized, the operators/graph.py
  pattern) so a 1000-merge run does not accrete a 1000-stage plan.
- ``bpe_encode`` is MAP-ONLY over the corpus: the learned merge ranks
  (vocab-sized) broadcast into mapInPandas; each Arrow batch memoizes
  word → subwords so the greedy merge loop runs once per DISTINCT word
  per batch, not once per token.

Tokenization matches build_vocab/encode_with_vocab: whitespace split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"

MERGES_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)

_WORDS_SCHEMA = T.StructType(
    [
        T.StructField("symbols", T.ArrayType(T.StringType()), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int = 50_000,
) -> DataFrame:
    """Corpus → (word, n) frequency table: the single corpus-wide pass.
    Deterministic cap: top ``max_words`` by (n desc, word asc) via
    TakeOrdered — no full sort."""
    toks = df.select(F.explode(F.split(text_col, " ")).alias("word")).where(
        F.col("word") != ""
    )
    counts = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(max_words)


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → character symbols with the Sennrich end-of-word convention:
    the LAST character is fused with the marker ('word' → [w,o,r,d</w>]),
    so word-final and word-internal units are distinct symbols.  Python
    ``list(word)`` (code-point) semantics via one Arrow pass over the
    dimension-sized word table — NOT JVM ``split('')``, whose UTF-16
    surrogate splitting would silently diverge from the pure-Python
    encode/oracle paths on astral-plane characters."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            syms = [
                list(w[:-1]) + [w[-1] + END] for w in pdf["word"]
            ]
            yield pd.DataFrame(
                {
                    "symbols": pd.Series(syms, dtype="object"),
                    "n": pdf["n"].astype("int64"),
                }
            )

    return words.mapInPandas(run, schema=_WORDS_SCHEMA)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency — explode is
    narrow, the groupBy is one partial-aggregating shuffle over the
    dimension-sized word table."""
    k = F.size("symbols")
    pairs = F.zip_with(
        F.slice("symbols", 1, k - 1),
        F.slice("symbols", 2, k - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        words.where(k >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("cnt"))
    )


def _select_batch(cands, batch: int) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint prefix of the ranked candidate slice.
    Disjointness is what makes the in-round counts exact: a selected
    merge can only change counts of pairs sharing one of its symbols."""
    chosen: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for r in cands:
        if len(chosen) >= batch:
            break
        if r["left"] in used or r["right"] in used:
            continue
        chosen.append((r["left"], r["right"], int(r["cnt"])))
        used.add(r["left"])
        used.add(r["right"])
    return chosen


def _apply_merges_df(words: DataFrame, round_merges: list[tuple[str, str]]) -> DataFrame:
    """Rewrite every word's symbol array with this round's merges, in
    rank order (Arrow-batched; the table is dimension-sized)."""
    import pandas as pd

    ms = list(round_merges)

    def run(batches):
        for pdf in batches:
            out = []
            for sym in pdf["symbols"]:
                sym = list(sym)
                for left, right in ms:
                    i, merged = 0, []
                    while i < len(sym):
                        if (
                            i + 1 < len(sym)
                            and sym[i] == left
                            and sym[i + 1] == right
                        ):
                            merged.append(left + right)
                            i += 2
                        else:
                            merged.append(sym[i])
                            i += 1
                    sym = merged
                out.append(sym)
            pdf = pdf.copy()
            pdf["symbols"] = pd.Series(out, dtype="object", index=pdf.index)
            yield pdf

    return words.mapInPandas(run, schema=_WORDS_SCHEMA)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    batch: int = 1,
    min_count: int = 2,
    max_words: int = 50_000,
    checkpoint_every: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the merge
    table (rank, left, right, cnt) with cnt the pair's weighted count at
    selection time.  ``batch=1`` is exact sequential Sennrich BPE;
    ``batch>1`` batches symbol-disjoint merges per distributed round
    (see module docstring for the equivalence argument and deviation).

    The TakeOrdered word-table cap leaves ONE partition — fine (and
    Exchange-free per round) at the default 50k words; set ``partitions``
    to spread the per-round merge-apply across executors when training
    on a multi-million-word table."""
    spark = df.sparkSession
    words = _initial_symbols(
        word_counts(df, text_col, min_count=min_count, max_words=max_words)
    )
    if partitions:
        words = words.repartition(partitions)
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    rounds_since_ckpt = 0
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        # 4× slice: disjointness skips at most |chosen| conflicting rows
        # per pick, so 4·batch candidates always fill the batch unless
        # the pair table itself is nearly exhausted.
        cands = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(4 * want)
            .collect()
        )
        chosen = _select_batch(cands, want)
        if not chosen:
            break  # vocabulary fully merged
        for left, right, cnt in chosen:
            merges.append((len(merges), left, right, cnt))
        words = _apply_merges_df(words, [(l, r) for l, r, _ in chosen])
        rounds_since_ckpt += 1
        if rounds_since_ckpt >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            rounds_since_ckpt = 0
    return spark.createDataFrame(merges, schema=MERGES_SCHEMA)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply for one word: repeatedly merge the present pair
    with the LOWEST learned rank (the standard subword-nmt/GPT-2 apply
    loop) until no learned pair remains."""
    if not word:
        return []
    sym = list(word[:-1]) + [word[-1] + END]
    while len(sym) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        left, right = sym[best_i], sym[best_i + 1]
        i, merged = 0, []
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(sym[i])
                i += 1
        sym = merged
    return sym


def bpe_encode(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Apply learned merges to every document: adds ``subwords``
    (array<string>) and ``n_subwords``.  Merge ranks are vocab-sized —
    collected once, broadcast, applied map-only with a per-batch
    word → subwords memo (the corpus never shuffles)."""
    import pandas as pd

    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.select("rank", "left", "right").collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("subwords", T.ArrayType(T.StringType())),
            T.StructField("n_subwords", T.IntegerType()),
        ]
    )

    def run(batches):
        rk = bc.value
        # word → subwords memo scoped to the TASK, not the batch: word
        # frequencies are Zipfian, so across a partition's batches the
        # hit rate approaches 1 and encode_word runs ~once per distinct
        # word per task (round 6; was re-encoded per 10k-row batch)
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            subs, ns = [], []
            for text in pdf[text_col]:
                row: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w, rk)
                    row.extend(got)
                subs.append(row)
                ns.append(len(row))
            pdf = pdf.copy()
            pdf["subwords"] = pd.Series(subs, dtype="object", index=pdf.index)
            pdf["n_subwords"] = pd.Series(ns, dtype="int32", index=pdf.index)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
