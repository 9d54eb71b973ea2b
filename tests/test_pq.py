"""Product quantization (operators/similarity.pq_*)."""

import pytest
from pyspark.sql import functions as F

from dug_spark.functions import pyoracle as po
from dug_spark.operators import similarity


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in df.collect()
    ]
    return df, rows


def test_codebooks_match_python_mirror(vecs):
    df, rows = vecs
    cbs = similarity.pq_train(df, m=8, ksub=8, iters=1)
    cbp = po.pq_train_py(rows, m=8, ksub=8, iters=1)
    assert cbs == cbp


def test_codebook_shape_and_dim_check(vecs):
    df, rows = vecs
    cbs = similarity.pq_train(df, m=4, ksub=8, iters=1)
    assert len(cbs) == 4 and len(cbs[0]) == 8 and len(cbs[0][0]) == 16
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train(df, m=7)


def test_encode_reconstruction_beats_random_code(vecs):
    """The trained code's reconstruction must be closer to the vector
    than codebook entry 0 everywhere would be (sanity that encoding
    really picks nearest centroids)."""
    df, rows = vecs
    cbs = similarity.pq_train(df, m=8, ksub=8, iters=1)
    enc = {r["vec_id"]: r["code"] for r in similarity.pq_encode(df, cbs).collect()}
    dsub = len(cbs[0][0])

    def recon_err(v, code):
        e = 0.0
        for s, j in enumerate(code):
            for a, b in zip(v[s * dsub : (s + 1) * dsub], cbs[s][j]):
                e += (a - b) * (a - b)
        return e

    worse = sum(
        1
        for vid, v in rows
        if recon_err(v, enc[vid]) > recon_err(v, [0] * 8) + 1e-12
    )
    assert worse == 0


def test_ivf_adc_matches_python_mirror(vecs):
    df, rows = vecs
    q = df.where(F.col("vec_id") < 20)
    got = sorted(
        map(tuple, similarity.pq_ivf_topk(q, df, k=5, k_cells=4, m=8, ksub=8).collect())
    )
    want = sorted(po.pq_ivf_topk([r for r in rows if r[0] < 20], rows, k=5, k_cells=4, m=8, ksub=8))
    assert got == want


def test_adc_recall_on_planted_clusters(spark):
    """Planted-cluster recall: 10 well-separated anchors, each with 3
    tight near-copies.  Querying an anchor must surface its own copies in
    the ADC top-3 — on separable data the approximation has to work; the
    uniform synthetic embeddings (where neighbor gaps sit below PQ
    distortion) can't discriminate a correct implementation from a broken
    one, so the recall check uses this controlled set instead."""
    import math

    dim, rows = 16, []
    for a in range(10):
        # anchor direction: deterministic spread-out unit-ish vectors
        base = [math.sin(0.7 * a * (d + 1)) * 5.0 for d in range(dim)]
        rows.append((a * 10, base))
        for c in range(1, 4):
            pert = list(base)
            pert[c] += 0.05 * c
            rows.append((a * 10 + c, pert))
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    q = df.where(F.col("vec_id") % 10 == 0)
    approx = {}
    for r in similarity.pq_ivf_topk(
        q, df, k=3, k_cells=2, m=4, ksub=16, pq_iters=2
    ).collect():
        approx.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    hits = sum(
        1
        for a in range(10)
        for c in range(1, 4)
        if a * 10 + c in approx.get(a * 10, set())
    )
    assert hits >= 25, approx  # ≥ 25/30 planted copies recovered


def test_arrow_and_jvm_paths_bit_identical(vecs):
    """The Arrow/numpy kernels must reproduce the literal-JVM fold
    results exactly (sequential addition order, first-min/max ties) —
    train, encode, and full search."""
    df, rows = vecs
    cb_a = similarity.pq_train(df, m=8, ksub=8, iters=1, use_arrow=True)
    cb_j = similarity.pq_train(df, m=8, ksub=8, iters=1, use_arrow=False)
    assert cb_a == cb_j
    enc_a = {r["vec_id"]: list(r["code"]) for r in similarity.pq_encode(df, cb_a, use_arrow=True).collect()}
    enc_j = {r["vec_id"]: list(r["code"]) for r in similarity.pq_encode(df, cb_j, use_arrow=False).collect()}
    assert enc_a == enc_j
    q = df.where(F.col("vec_id") < 10)
    s_a = sorted(map(tuple, similarity.pq_ivf_topk(q, df, k=3, k_cells=4, m=8, ksub=8, use_arrow=True).collect()))
    s_j = sorted(map(tuple, similarity.pq_ivf_topk(q, df, k=3, k_cells=4, m=8, ksub=8, use_arrow=False).collect()))
    assert s_a == s_j
