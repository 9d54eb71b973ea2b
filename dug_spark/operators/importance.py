"""DSIR-style data selection: hashed-n-gram importance resampling.

Re-derivation of Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023): estimate a target (trusted) and a
raw-corpus distribution over HASHED unigram+bigram features, score every
raw document with the log importance weight

    log w(x) = Σ_features  log p_target(bucket(f)) − log p_raw(bucket(f))

under Laplace-smoothed bucket multinomials, and select documents by
Gumbel-top-k over the weights (the paper's importance *resampling* — a
deterministic seeded Gumbel here, so two engines and two cluster sizes
select the same set).

The reference pipeline has no selection stage (it indexes everything a
parser emits); at web scale, selecting the CCNet/DSIR way is what keeps a
10^12-document crawl trainable.  This composes with the CCNet-style
perplexity filter in operators/lm.py: DSIR is the cheap bag-of-ngrams
selector, the LM filter the sequence-model refiner.

Scale shape (all JVM-side, no Python in the corpus path):
- feature hashing is xxhash64 (seed 42, Spark's literal) pmod buckets —
  the feature space is FIXED-size regardless of vocabulary, so the two
  count tables are bucket-sized (default 4096 rows): ONE explode→groupBy
  shuffle each, then a driver collect of ≤ buckets rows (the same class
  as lm.py's CCNet-shape count-table collects, but bounded by the bucket
  knob rather than the vocabulary).
- the per-bucket log-ratio table broadcasts; scoring the raw corpus is
  explode → broadcast join → ONE doc-keyed aggregation with map-side
  partial sums.  No concept/vocab-keyed shuffle anywhere.
- top-k selection runs as TakeOrderedAndProject (distributed heap, no
  global sort); k is driver-bounded by design.  For fractional selection
  at 10^12 docs use ``frac=`` instead: an approxQuantile cutoff on the
  Gumbel-perturbed key, one pass, no collect of the selection.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 4096
# resolution of the hash→uniform map for the Gumbel noise; 2^20 cells
# keeps u in (0, 1) exclusive (the +0.5 cell-centering never hits 0 or 1)
_U_CELLS = 1 << 20


def _tokens(text_col: str):
    # the shared lm.py tokenizer: lowercase alnum runs
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != ""
    )


def _features(text_col: str):
    """unigrams ++ space-joined bigrams, as one array column."""
    toks = _tokens(text_col)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def hashed_feature_counts(
    df: DataFrame, text_col: str = "text", buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """(bucket, n) counts of hashed unigram+bigram features — ONE
    explode→groupBy shuffle; the result is bucket-sized."""
    return (
        df.select(F.explode(_features(text_col)).alias("f"))
        .select(F.pmod(F.xxhash64("f"), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document log importance weight of ``raw`` docs toward the
    ``target`` distribution: (id_col, n_feats, logw) — logw rounded to 5
    (cross-engine float-sum order, the PageRank-oracle reasoning).

    Both count tables collect (bucket-sized, ≤ ``buckets`` rows); the
    log-ratio table broadcasts back.  Docs with zero features score 0."""
    spark = raw.sparkSession
    t = {
        r["bucket"]: r["n"]
        for r in hashed_feature_counts(target, text_col, buckets).collect()
    }
    rr = {
        r["bucket"]: r["n"]
        for r in hashed_feature_counts(raw, text_col, buckets).collect()
    }
    t_tot, r_tot = sum(t.values()), sum(rr.values())
    lr_rows = [
        (
            b,
            math.log((t.get(b, 0) + alpha) / (t_tot + alpha * buckets))
            - math.log((rr.get(b, 0) + alpha) / (r_tot + alpha * buckets)),
        )
        for b in range(buckets)
    ]
    lr = F.broadcast(spark.createDataFrame(lr_rows, "bucket bigint, lr double"))
    scored = (
        raw.select(F.col(id_col), F.explode(_features(text_col)).alias("f"))
        .select(id_col, F.pmod(F.xxhash64("f"), F.lit(buckets)).alias("bucket"))
        .join(lr, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("logw"),
        )
    )
    ids = raw.select(id_col).distinct()
    return ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.round(F.coalesce("logw", F.lit(0.0)), 5).alias("logw"),
    )


def _gumbel_key(id_col: str, seed: int):
    """Deterministic Gumbel(0,1) noise from xxhash64(id#seed): the
    Gumbel-top-k trick samples WITHOUT replacement ∝ exp(logw) — with a
    seeded hash both engines and any partitioning draw the same noise."""
    u = (
        F.pmod(
            F.xxhash64(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
            F.lit(_U_CELLS),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_U_CELLS))
    return -F.log(-F.log(u))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int | None = None,
    frac: float | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """Gumbel-top-k importance resampling: one verdict row per raw doc —
    (id_col, n_feats, logw, keep) with exactly ``k`` keepers (ties on the
    perturbed key broken by id asc).

    ``k`` mode (driver-bounded selections, and the oracle path): the
    selected ids come from TakeOrderedAndProject over (key desc, id asc)
    and broadcast back as a semi-join flag.  ``frac`` mode (the 10^12-doc
    path): an approxQuantile cutoff on the perturbed key — no driver-side
    selection materialization, at the cost of ±relativeError on the kept
    fraction."""
    if (k is None) == (frac is None):
        raise ValueError("dsir_resample: pass exactly one of k / frac")
    w = dsir_weights(raw, target, text_col, id_col, buckets, alpha)
    keyed = w.withColumn("_key", F.col("logw") + _gumbel_key(id_col, seed))
    if k is not None:
        kept = (
            keyed.orderBy(F.desc("_key"), F.asc(id_col))
            .limit(int(k))
            .select(F.col(id_col), F.lit(True).alias("keep"))
        )
        out = keyed.join(F.broadcast(kept), id_col, "left").select(
            id_col,
            "n_feats",
            "logw",
            F.coalesce("keep", F.lit(False)).alias("keep"),
        )
        return out
    keyed = keyed.localCheckpoint(eager=True)
    cutoff = keyed.stat.approxQuantile("_key", [1.0 - float(frac)], 0.001)[0]
    return keyed.select(
        id_col,
        "n_feats",
        "logw",
        (F.col("_key") >= F.lit(cutoff)).alias("keep"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    weight_col: str | None = None,
    seed: int = 11,
    salt_factor: int | None = None,
) -> DataFrame:
    """Per-group weighted reservoir sample: k rows per group without
    replacement with probability ∝ weight (Efraimidis & Spirakis 2006,
    via the equivalent Gumbel-top-k form: key = log w + Gumbel(0,1)).
    The Gumbel noise is hash-seeded from the id (same construction as
    dsir_resample), so the sample is a pure function of (rows, seed) —
    reproducible across partitionings, engines, and cluster sizes, which
    is what makes a deterministic train/eval split auditable.

    Returns ONLY the kept rows: (group_col, id_col, rank) with rank 1..k
    by descending perturbed key (ties broken by id asc).  Rows with NULL
    or non-positive weight are excluded (log w undefined — matching the
    E-S contract that weights are strictly positive).

    Scale path: top-k per group is a monoid, so ``salt_factor=s`` runs
    TWO bounded window passes — top-k within (group, salt-of-id) then
    top-k of the s*k survivors per group — and no single task ever sorts
    a whole hot group.  EXACTLY the same output as the one-pass window
    (every global top-k row is in its salt's top-k); tested both ways.
    ``salt_factor=None`` keeps the single window for small groups.

    Uniform sampling is weight_col=None (w=1: key reduces to pure
    Gumbel — a deterministic uniform k-reservoir per group).
    """
    from pyspark.sql.window import Window

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    keyed = (
        df.select(group_col, id_col, w.alias("_w"))
        .where(F.col("_w") > 0)
        .withColumn("_key", F.log("_w") + _gumbel_key(id_col, seed))
    )
    order = [F.desc("_key"), F.asc(id_col)]
    if salt_factor is not None:
        salt = F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
            F.lit(int(salt_factor)),
        )
        w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
        keyed = keyed.withColumn("_rn", F.row_number().over(w1)).where(
            F.col("_rn") <= k
        ).drop("_rn")
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        keyed.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(group_col, id_col, "rank")
    )
