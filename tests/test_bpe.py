"""BPE subword training/apply (operators/bpe.py vs both a textbook
sequential implementation straight from the Sennrich 2016 pseudocode and
the independent pyoracle mirror)."""

import pytest

from pyspark.sql import functions as F

from dug_spark.operators import bpe
from dug_spark.functions import pyoracle as po

SF = "/root/testdata/sf0.001"

TINY = [
    (0, "low low low lower lower newest newest newest newest widest"),
    (1, "low lower newest widest widest wide wide wide"),
    (2, "new new new newest lowest"),
]


def classic_sequential_bpe(word_counts, num_merges):
    """Textbook BPE: argmax pair, merge, repeat — written directly from
    the paper's pseudocode, independent of both implementations under
    test."""
    words = {}
    for w, n in word_counts.items():
        words[tuple(list(w[:-1]) + [w[-1] + "</w>"])] = (
            words.get(tuple(list(w[:-1]) + [w[-1] + "</w>"]), 0) + n
        )
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def _tiny_df(spark):
    return spark.createDataFrame(TINY, ["doc_id", "text"])


def test_batch1_matches_textbook_bpe(spark):
    """batch=1 is EXACT sequential Sennrich BPE."""
    wc = {}
    for _d, t in TINY:
        for w in t.split(" "):
            wc[w] = wc.get(w, 0) + 1
    want = classic_sequential_bpe(wc, 12)
    got = [
        (r["left"], r["right"])
        for r in bpe.train_bpe(
            _tiny_df(spark), num_merges=12, batch=1, min_count=1
        ).orderBy("rank").collect()
    ]
    assert got == want


def test_batched_matches_pyoracle_mirror(spark):
    got = [
        (r["rank"], r["left"], r["right"], r["cnt"])
        for r in bpe.train_bpe(
            _tiny_df(spark), num_merges=12, batch=4, min_count=1
        ).orderBy("rank").collect()
    ]
    want = po.bpe_train(TINY, num_merges=12, batch=4, min_count=1)
    assert got == want


def test_batch_selection_is_symbol_disjoint():
    cands = [
        {"left": "a", "right": "b", "cnt": 10},
        {"left": "b", "right": "c", "cnt": 9},  # shares 'b' with pick #1
        {"left": "c", "right": "d", "cnt": 8},  # 'c' was never accepted
        {"left": "x", "right": "y", "cnt": 7},
    ]
    chosen = bpe._select_batch(cands, 3)
    assert chosen == [("a", "b", 10), ("c", "d", 8), ("x", "y", 7)]


def test_encode_word_reconstructs_and_respects_ranks():
    merges = po.bpe_train(TINY, num_merges=12, batch=1, min_count=1)
    ranks = {(l, r): k for k, l, r, _ in merges}
    for w in ["lowest", "newest", "wide", "zzz", "a"]:
        sub = bpe.encode_word(w, ranks)
        assert "".join(sub) == w + "</w>"
        # pure mirror agrees
        assert sub == po.bpe_apply_word(w, ranks)
    assert bpe.encode_word("", ranks) == []


def test_bpe_encode_df_matches_pyoracle(spark):
    df = _tiny_df(spark)
    merges = bpe.train_bpe(df, num_merges=12, batch=4, min_count=1)
    enc = bpe.bpe_encode(df, merges).orderBy("doc_id").collect()
    py_merges = po.bpe_train(TINY, num_merges=12, batch=4, min_count=1)
    want = {d: (n, fp) for d, n, fp in po.bpe_doc_rows(TINY, py_merges)}
    import hashlib

    for r in enc:
        n, fp = want[r["doc_id"]]
        assert r["n_subwords"] == n
        assert hashlib.md5(" ".join(r["subwords"]).encode()).hexdigest() == fp


def test_bpe_on_real_docs_sample(spark):
    """End-to-end on driver testdata: multi-char subwords emerge, encode
    covers every doc, and OOV characters survive as singleton symbols."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    merges = bpe.train_bpe(docs, num_merges=30, batch=5, min_count=2,
                           max_words=2000)
    rows = merges.collect()
    assert len(rows) == 30
    assert any(len(r["left"]) + len(r["right"]) > 2 for r in rows)
    # counts are non-increasing ACROSS rounds only up to in-round
    # reordering; global sanity: every count positive
    assert all(r["cnt"] > 0 for r in rows)
    enc = bpe.bpe_encode(docs, merges)
    got = enc.select("doc_id", "n_subwords").collect()
    assert len(got) == 120 and all(r["n_subwords"] > 0 for r in got)


def test_empty_and_single_char_words(spark):
    df = spark.createDataFrame([(0, "a a a bb bb  c")], ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=5, batch=1, min_count=1)
    got = [(r["left"], r["right"]) for r in merges.collect()]
    # 'a' and 'c' are single-symbol words (no pairs); 'bb' → (b, b</w>)
    assert got == [("b", "b</w>")]
    enc = bpe.bpe_encode(df, merges).collect()[0]
    assert enc["subwords"] == ["a</w>", "a</w>", "a</w>", "bb</w>", "bb</w>", "c</w>"]
