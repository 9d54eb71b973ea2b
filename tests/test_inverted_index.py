"""Inverted-index materialization (search.build_inverted_index) vs
hand-computed postings: analyzer agreement, shard split, min_df."""

import hashlib

import pytest

from dug_spark.functions import analyzer
from dug_spark.operators import search

DOCS = [
    (0, "the quick brown fox"),
    (1, "quick quick fox"),
    (2, "brown cow"),
    (3, "the the the"),          # stopwords only → no tokens
    (4, None),                    # NULL text → no tokens
    (5, "fox fox fox cow"),
]


def _mirror(num_shards=1, min_df=1):
    tf = {}
    for i, text in DOCS:
        for t in analyzer.analyze(text):
            tf[(i, t)] = tf.get((i, t), 0) + 1
    rows = {}
    for (i, t), n in tf.items():
        rows.setdefault((t, i % num_shards), []).append((i, n))
    out = {}
    tdf = {}
    for (t, s), plist in rows.items():
        tdf[t] = tdf.get(t, 0) + len(plist)
    for (t, s), plist in rows.items():
        if tdf[t] < min_df:
            continue
        plist.sort()
        joined = ",".join(f"{i}:{n}" for i, n in plist)
        fp = hashlib.md5(joined.encode()).hexdigest()
        out[(t, s)] = (len(plist), sum(n for _i, n in plist), fp)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _run(docs, **kw):
    out = search.build_inverted_index(docs, **kw)
    return {
        (r["token"], r["shard"]): (r["df"], r["cf"], r["postings_fp"])
        for r in out.collect()
    }


def test_unsharded_matches_mirror(docs):
    assert _run(docs) == _mirror()


def test_sharded_matches_mirror(docs):
    assert _run(docs, num_shards=2) == _mirror(num_shards=2)


def test_min_df_prunes_across_shards(docs):
    # "quick" has df=2 overall but df=1 in each of 2 shards — a per-shard
    # threshold would wrongly drop it; the across-shard rule keeps it
    got = _run(docs, num_shards=2, min_df=2)
    assert got == _mirror(num_shards=2, min_df=2)
    assert ("quick", 0) in got and ("quick", 1) in got


def test_postings_column_carries_list(spark, docs):
    row = (
        search.build_inverted_index(docs)
        .where("token = 'fox'")
        .collect()[0]
    )
    assert [(p["id"], p["tf"]) for p in row["postings"]] == [
        (0, 1), (1, 1), (5, 3),
    ]
