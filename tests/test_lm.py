"""LM-perplexity filtering and sequence packing (operators/lm.py) —
Spark vs the independent pure-Python recompute (functions/pyoracle), plus
plan-shape and edge-case checks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dug_spark.functions import pyoracle as po
from dug_spark.operators import lm


@pytest.fixture(scope="module")
def docs_py(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [(int(d), t) for d, t in rows]


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_perplexity_matches_pyoracle(spark, docs_df, docs_py):
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["cross_entropy"],
            r["perplexity"],
            r["ppl_bucket"],
        )
        for r in lm.perplexity_filter(docs_df, ref).select(
            "doc_id", "n_tokens", "cross_entropy", "perplexity", "ppl_bucket"
        ).collect()
    }
    expected = {d: (n, h, p, b) for d, n, h, p, b in po.lm_rows(docs_py)}
    assert got == expected


def test_perplexity_buckets_and_ordering(spark, docs_df):
    """In-training reference docs must score lower (more head/middle) than
    unseen docs on average, and every bucket label is valid."""
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    scored = lm.perplexity_filter(docs_df, ref)
    rows = scored.select("doc_id", "perplexity", "ppl_bucket").collect()
    assert {r["ppl_bucket"] for r in rows} <= {"head", "middle", "tail", "empty"}
    ref_mean = sum(r["perplexity"] for r in rows if r["doc_id"] % 10 == 0) / max(
        sum(1 for r in rows if r["doc_id"] % 10 == 0), 1
    )
    other_mean = sum(r["perplexity"] for r in rows if r["doc_id"] % 10 != 0) / max(
        sum(1 for r in rows if r["doc_id"] % 10 != 0), 1
    )
    assert ref_mean < other_mean


def test_perplexity_empty_and_unseen(spark):
    ref = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(2, ""), (3, "zzz qqq"), (4, "the cat sat")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm.perplexity_filter(tgt, ref).collect()
    }
    assert rows[2]["ppl_bucket"] == "empty" and rows[2]["n_tokens"] == 0
    assert rows[2]["cross_entropy"] == 0.0
    # fully unseen tokens score strictly worse than an in-training doc
    assert rows[3]["perplexity"] > rows[4]["perplexity"]


def test_perplexity_heldout_calibration(spark, docs_df):
    """cutoff_ref calibrates buckets on a held-out slice: with in-train
    cutoffs nearly everything scores tail (the tiny LM memorizes its
    training docs); held-out cutoffs restore the ~2/3 head+middle split."""
    from pyspark.sql import functions as F

    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    calib = docs_df.where(F.col("doc_id") % 10 == 1)
    scored = lm.perplexity_filter(docs_df, ref, cutoff_ref=calib)
    counts = dict(
        scored.groupBy("ppl_bucket").count().rdd.map(tuple).collect()
    )
    total = sum(counts.values())
    kept = counts.get("head", 0) + counts.get("middle", 0)
    assert 0.5 < kept / total < 0.85  # ~2/3, vs <0.1 with in-train cutoffs


def test_perplexity_scoring_is_map_only(spark, docs_df):
    """The scoring side must not shuffle the corpus: no Exchange in the
    scored plan (training/cutoff collects run separately up front)."""
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    plan = lm.perplexity_filter(docs_df, ref)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_matches_pyoracle(spark, docs_df, docs_py):
    got = [
        tuple(r)
        for r in lm.pack_sequences(docs_df, budget=128, n_shards=8)
        .orderBy("shard", "seq_id", "doc_id")
        .collect()
    ]
    assert got == po.pack_rows(docs_py, budget=128, n_shards=8)


def test_pack_partitioning_invariance(spark, docs_df, docs_py):
    """Result is independent of input partitioning (greedy order is fixed
    by doc_id within shard, not by physical layout)."""
    got = [
        tuple(r)
        for r in lm.pack_sequences(docs_df.repartition(13), budget=128, n_shards=8)
        .orderBy("shard", "seq_id", "doc_id")
        .collect()
    ]
    assert got == po.pack_rows(docs_py, budget=128, n_shards=8)


def test_pack_semantics(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c"),          # 3 tokens
            (8, "d e f g"),        # 4 tokens → closes seq 0 at 7/8? no: 3+4=7 ≤ 8
            (16, "h i"),           # 2 tokens → 7+2=9 > 8 → seq 1
            (24, " ".join("x%d" % i for i in range(9))),  # 9 > budget → oversize
            (32, "y"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in lm.pack_sequences(df, budget=8, n_shards=1).collect()
    }
    assert rows[0]["seq_id"] == 0 and rows[0]["tok_offset"] == 0
    assert rows[8]["seq_id"] == 0 and rows[8]["tok_offset"] == 3
    assert rows[16]["seq_id"] == 1 and rows[16]["tok_offset"] == 0
    assert rows[24]["seq_id"] == 2 and rows[24]["oversize"]
    # the oversize doc closes its sequence; next doc opens a fresh one
    assert rows[32]["seq_id"] == 3 and rows[32]["tok_offset"] == 0
    assert not rows[32]["oversize"]


def test_pack_exact_fill_closes_sequence(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in lm.pack_sequences(df, budget=4, n_shards=1).collect()
    }
    assert rows[0]["seq_id"] == 0 and not rows[0]["oversize"]
    assert rows[1]["seq_id"] == 1 and rows[1]["tok_offset"] == 0


def test_pack_single_shuffle(spark, docs_df):
    plan = (
        lm.pack_sequences(docs_df, budget=128, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# Pruned interpolated trigram (round 5 — the CCNet-shape model upgrade)


def test_trigram_matches_pyoracle(spark, docs_df, docs_py):
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["cross_entropy"],
            r["perplexity"],
            r["ppl_bucket"],
        )
        for r in lm.perplexity_filter(docs_df, ref, order=3).select(
            "doc_id", "n_tokens", "cross_entropy", "perplexity", "ppl_bucket"
        ).collect()
    }
    expected = {
        d: (n, h, p, b) for d, n, h, p, b in po.lm_rows(docs_py, order=3)
    }
    assert got == expected


def test_trigram_pruning_ledger(spark, docs_df):
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    tables, ledger = lm.train_trigram_lm(ref, prune_trigram=2)
    assert ledger["trigrams_kept"] + ledger["trigrams_pruned"] == ledger[
        "trigram_types"
    ]
    assert ledger["trigrams_pruned"] > 0  # web-ish text has singleton tails
    assert all(n >= 2 for n in tables["trigrams"].values())
    # every kept trigram's denominator survives ctx3 pruning
    for (c2, c1, _w), n in tables["trigrams"].items():
        assert tables["ctx3"].get((c2, c1), 0) >= n
    # pruning bounds the broadcast: kept strictly smaller than raw types
    assert ledger["trigrams_kept"] < ledger["trigram_types"]


def test_trigram_improves_fit_on_reference(spark, docs_df):
    """On its own training slice the UNPRUNED interpolated trigram must
    fit better than the bigram (the point of the higher order).  At this
    tiny 500-doc reference, pruning at count≥2 drops most trigram types
    (they're singletons), so the pruned model is allowed to fit worse —
    that's the documented trade: pruning bounds the broadcast, backoff
    absorbs the dropped mass.  At CCNet's 10^7-doc reference the kept
    mass is far larger."""
    ref = docs_df.where(F.col("doc_id") % 10 == 0)
    bi = lm.perplexity_filter(ref, ref).agg(
        F.avg("cross_entropy").alias("h")
    ).collect()[0]["h"]
    tri_unpruned = lm.perplexity_filter(
        ref, ref, order=3, prune_trigram=1
    ).agg(F.avg("cross_entropy").alias("h")).collect()[0]["h"]
    assert tri_unpruned < bi


def test_trigram_invalid_order_raises(spark, docs_df):
    with pytest.raises(ValueError, match="order"):
        lm.perplexity_filter(docs_df, docs_df, order=4)
