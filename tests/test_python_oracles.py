"""Independent pure-Python recomputation oracles for the operators the
DuckDB driver can't check (they depend on Spark's xxhash64 or on
driver-generated hyperplanes): simhash dedup, LSH ANN, IVF ANN.

The XXH64 implementation below is written from the public xxHash spec
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) — it
shares no code with Spark; agreement on the full operator outputs is the
correctness check (the driver marks these queries rows-only).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from dug_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 from the public spec; returns Spark's signed-long convention.
    Spark's xxhash64 hashes strings as their UTF-8 bytes with seed 42."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
                v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
                v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
                v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


@pytest.fixture(scope="module")
def docs30(spark):
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") < 30)
        .select("doc_id", "text")
        .collect()
    )
    return [(r["doc_id"], r["text"]) for r in rows]


def test_xxh64_matches_spark(spark):
    samples = ["", "a", "heart attack", "x" * 7, "y" * 37, "unicode ñé"]
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for s in samples:
        assert xxh64(s.encode("utf-8"), 42) == got[s], s


def _py_simhash(text: str) -> int:
    votes = [0] * 64
    for tok in text.split(" "):
        h = xxh64(tok.encode("utf-8"), 42) & _M
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    u = sum((1 << b) for b in range(64) if votes[b] > 0)
    return u - (1 << 64) if u >= 1 << 63 else u


def test_simhash_python_recompute(spark, docs30):
    df = spark.createDataFrame(docs30, "doc_id int, text string")
    got = {r["doc"]: r["simhash"] for r in dedup.simhash(df).collect()}
    for doc_id, text in docs30:
        assert got[doc_id] == _py_simhash(text), doc_id


def test_simhash_near_duplicates_python_recompute(spark, docs30):
    df = spark.createDataFrame(docs30, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(df, max_hamming=10, bands=8).collect()
    }
    sigs = {d: _py_simhash(t) & _M for d, t in docs30}
    width, mask = 8, (1 << 8) - 1
    buckets = defaultdict(set)
    for d, s in sigs.items():
        for b in range(8):
            buckets[(b, (s >> (b * width)) & mask)].add(d)
    expect = {}
    for members in buckets.values():
        for a in members:
            for b in members:
                if a < b:
                    ham = bin(sigs[a] ^ sigs[b]).count("1")
                    if ham <= 10:
                        expect[(a, b)] = ham
    assert got == expect


@pytest.fixture(scope="module")
def vecs(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    return [(r["vec_id"], [float(x) for x in r["embedding"]], r["label"]) for r in rows]


def _py_cos(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    nb = 0.0
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _py_lsh_sig(v: list[float], planes: list[list[float]]) -> int:
    sig = 0
    for i, p in enumerate(planes):
        d = 0.0
        for x, y in zip(v, p):
            d += x * y
        if d > 0:
            sig |= 1 << i
    return sig


def test_lsh_topk_python_recompute(spark, vecs):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    got = [
        (r["q_id"], r["neighbor_id"], r["rk"], r["cos_sim"])
        for r in similarity.lsh_topk(q, emb, dim=64, k=3, bits=16, bands=8)
        .orderBy("q_id", "rk")
        .collect()
    ]
    # hyperplanes re-derived from the documented generator contract
    rng = random.Random(7)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(16)]
    sigs = {vid: _py_lsh_sig(v, planes) for vid, v, _l in vecs}
    by_vec = {vid: v for vid, v, _l in vecs}
    width, mask = 2, (1 << 2) - 1
    buckets = defaultdict(set)
    for vid, s in sigs.items():
        for b in range(8):
            buckets[(b, (s >> (b * width)) & mask)].add(vid)
    expect = []
    for qid in range(10):
        cands = set()
        for b in range(8):
            cands |= buckets[(b, (sigs[qid] >> (b * width)) & mask)]
        cands.discard(qid)
        ranked = sorted(
            ((_py_cos(by_vec[qid], by_vec[c]), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        for rk, (cos, c) in enumerate(ranked, 1):
            expect.append((qid, c, rk, round(cos, 6)))
    assert got == expect


def test_ivf_topk_python_recompute(spark, vecs):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    got = [
        (r["q_id"], r["neighbor_id"], r["rk"], r["cos_sim"])
        for r in similarity.ivf_topk(q, emb, k=3).orderBy("q_id", "rk").collect()
    ]
    by_vec = {vid: v for vid, v, _l in vecs}
    by_label = defaultdict(list)
    for vid, _v, lab in vecs:
        by_label[lab].append(vid)
    labels = {vid: lab for vid, _v, lab in vecs}
    expect = []
    for qid in range(10):
        cands = [c for c in by_label[labels[qid]] if c != qid]
        ranked = sorted(
            ((_py_cos(by_vec[qid], by_vec[c]), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        for rk, (cos, c) in enumerate(ranked, 1):
            expect.append((qid, c, rk, round(cos, 6)))
    assert got == expect


def test_xxh64_int_arg_chaining(spark):
    """Spark's multi-arg xxhash64 folds: seed 42 → hash(arg1) → that hash
    seeds hash(arg2); int args take the 4-byte path."""
    rows = (
        spark.createDataFrame([("heart attack",)], "s string")
        .select(*[F.xxhash64("s", F.lit(i)).alias(f"h{i}") for i in range(4)])
        .collect()[0]
    )
    h1 = xxh64("heart attack".encode(), 42) & _M
    for i in range(4):
        assert rows[f"h{i}"] == xxh64(i.to_bytes(4, "little"), h1)


def _py_minhash_pairs(docs, num_hashes=32, bands=8, shingle=3, threshold=0.9):
    """Full independent recompute of minhash_near_duplicates: shingles →
    chained-xxhash64 signatures → band buckets → candidate pairs → exact
    Jaccard on candidates only."""
    sh = {}
    for d, t in docs:
        words = t.split(" ")
        s = set()
        if len(words) >= shingle:
            s = {
                " ".join(words[i : i + shingle])
                for i in range(len(words) - shingle + 1)
            }
        s = {x for x in s if len(x) > 0}
        if s:
            sh[d] = s

    def hv(s: str, i: int) -> int:
        return xxh64(i.to_bytes(4, "little"), xxh64(s.encode(), 42) & _M)

    sigs = {
        d: [min(hv(s, i) for s in ss) for i in range(num_hashes)]
        for d, ss in sh.items()
    }
    rpb = num_hashes // bands
    buckets = defaultdict(set)
    for d, sig in sigs.items():
        for b in range(bands):
            key = "_".join(str(sig[b * rpb + r]) for r in range(rpb))
            buckets[(b, xxh64(key.encode(), 42))].add(d)
    cands = set()
    for mem in buckets.values():
        for a in mem:
            for b2 in mem:
                if a < b2:
                    cands.add((a, b2))
    out = []
    for a, b2 in sorted(cands):
        inter = len(sh[a] & sh[b2])
        j = inter / (len(sh[a]) + len(sh[b2]) - inter)
        if j >= threshold:
            out.append((a, b2, j))
    return out


def test_minhash_near_duplicates_python_recompute(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_near_duplicates(df).collect()
    )
    expect = _py_minhash_pairs(docs)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    for (_, _, jg), (_, _, je) in zip(got, expect):
        assert abs(jg - je) < 1e-6
