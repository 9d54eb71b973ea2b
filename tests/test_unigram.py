"""Unigram-LM tokenizer (operators/unigram.py) vs the pure-Python
mirror (pyoracle.unigram_train/_uni_viterbi) + hand-checked Viterbi."""

import math

import pytest

from dug_spark.functions import pyoracle as po
from dug_spark.operators import unigram


# ---------------------------------------------------------------- viterbi


def test_viterbi_prefers_higher_likelihood():
    model = {"ab": math.log(0.5), "a": math.log(0.25), "b": math.log(0.25)}
    assert unigram.viterbi_segment("ab", model, 8) == ["ab"]
    # two singles: 0.0625 < 0.5 — the multi-piece wins
    assert unigram.viterbi_segment("abab", model, 8) == ["ab", "ab"]


def test_viterbi_tie_breaks_to_longer_final_piece():
    # p("ab") = p("a")·p("b") exactly ⇒ tie; longer piece must win
    model = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    assert unigram.viterbi_segment("ab", model, 8) == ["ab"]


def test_viterbi_unknown_char_fallback():
    model = {"a": math.log(0.5)}
    assert unigram.viterbi_segment("axa", model, 8) == ["a", "x", "a"]


def test_viterbi_matches_mirror():
    model = {"un": -1.0, "ig": -1.5, "r": -2.0, "u": -3.0, "n": -3.0,
             "i": -3.0, "g": -3.0, "a": -3.0, "m": -3.0, "ram": -2.2}
    for w in ["unigram", "rum", "ii", "gram"]:
        assert unigram.viterbi_segment(w, model, 8) == po._uni_viterbi(w, model, 8)


# ---------------------------------------------------------------- training


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "a cat and a rat sat"),
    (3, "the mat and the rat"),
    (4, "cats eat rats on mats"),
    (5, "the cat sat on the mat"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_train_matches_mirror_exactly(spark, corpus_df):
    kw = dict(
        vocab_size=20,
        seed_size=60,
        max_piece_len=4,
        em_iters=1,
        shrink=0.6,
        min_count=1,
        max_words=100,
    )
    got = [
        (r["piece"], r["logp"])
        for r in unigram.train_unigram(corpus_df, **kw).collect()
    ]
    want = po.unigram_train(CORPUS, **kw)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-12)


def test_single_chars_survive_pruning(spark, corpus_df):
    vocab = {
        r["piece"]
        for r in unigram.train_unigram(
            corpus_df, vocab_size=12, seed_size=40, max_piece_len=4,
            em_iters=1, min_count=1,
        ).collect()
    }
    for ch in "thecatsonm":
        assert ch in vocab


def test_probs_normalize(spark, corpus_df):
    rows = unigram.train_unigram(
        corpus_df, vocab_size=15, seed_size=40, max_piece_len=4,
        em_iters=2, min_count=1,
    ).collect()
    # after a final EM round the probs are count/total for every USED
    # piece (Σ = 1 exactly) plus the 0.5/total coverage floor for single
    # chars no best segmentation used — so Σ exp(logp) sits at 1 + ε
    s = sum(math.exp(r["logp"]) for r in rows)
    assert 1.0 <= s < 1.1


# ---------------------------------------------------------------- encoding


def test_encode_roundtrip_and_counts(spark, corpus_df):
    vocab = unigram.train_unigram(
        corpus_df, vocab_size=25, seed_size=60, max_piece_len=4,
        em_iters=1, min_count=1,
    )
    enc = {
        r["doc_id"]: r
        for r in unigram.unigram_encode(corpus_df, vocab, max_piece_len=4).collect()
    }
    assert set(enc) == {d for d, _ in CORPUS}
    for doc_id, text in CORPUS:
        row = enc[doc_id]
        # concatenating pieces reconstructs the text minus whitespace
        assert "".join(row["pieces"]) == text.replace(" ", "")
        assert row["n_pieces"] == len(row["pieces"])
    # mirror agreement on counts
    want = dict(
        po.unigram_doc_rows(
            CORPUS,
            [(r["piece"], r["logp"]) for r in vocab.collect()],
            max_piece_len=4,
        )
    )
    assert {d: r["n_pieces"] for d, r in enc.items()} == want


def test_encode_handles_null_and_unknown(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "zzz")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("a", -1.0)], "piece string, logp double")
    enc = {r["doc_id"]: r for r in unigram.unigram_encode(df, vocab).collect()}
    assert enc[0]["n_pieces"] == 0
    assert enc[1]["pieces"] == ["z", "z", "z"]  # UNK single-char fallback
