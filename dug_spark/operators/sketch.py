"""Mergeable distinct-count sketches (bucketed-minimum KMV).

Web-scale motivation: "distinct URLs per host", "distinct visitors per
site", "token-vocabulary overlap between two crawl snapshots" are the
bread-and-butter cardinality questions over a 10^12-row corpus, and the
exact answer (``countDistinct``) needs a shuffle of every distinct value.
The classic sketch answer (KMV / bottom-k order statistics, Bar-Yossef
2002; stochastic averaging as in Flajolet's PCSA/HLL family) reduces the
state per group to a constant number of hash minima, which Spark computes
with an ordinary ``min`` aggregate: map-side partial aggregation absorbs
the full data volume, and the single shuffle carries at most
|groups| x buckets rows.  The bucket index doubles as a salt — a hot
group's rows spread over `buckets` reducer keys, so the skewed-host case
that breaks a naive per-group agg is handled by construction.

Reference parity: the reference pipeline has no sketching layer (its
Elasticsearch backend answers cardinality with its own HLL-based
``cardinality`` agg, src/dug/core/async_search.py facet aggregations);
this module is the engine-native equivalent, listed under the
beyond-reference training-data operators in SURVEY.md §2.

Design — every number is deterministic and cross-checkable:

- value hash  h      = xxhash64(value)              (Spark built-in, seed 42)
- bucket      b      = pmod(xxhash64(value, lit(1)), B)   (independent hash)
- sketch row         = (group..., b, min h)         — plain BIGINT minima
- estimator          : map h to u = (h + 2^63) / 2^64 in (0,1); an empty
  bucket contributes u = 1.  With n/B distinct values per bucket,
  E[min u] = 1/(n/B + 1), so  E[sum_u] = B^2/(n+B)  and
      n_hat = B^2 / sum_u - B.
  The sum is kept EXACT in integers (Decimal(38,0)):
      S = sum(min_h) + 2^63 * (2B - buckets_hit)        (= sum_u * 2^64)
      n_hat = B^2 * 2^64 / double(S) - B
  so the only floating-point steps are one decimal->double cast and one
  division — bit-reproducible across partition orders, mirrored exactly
  by dug_spark.functions.pyoracle.kmv_rows (spec-derived XXH64), and safe
  to hash-compare at ROUND(.., 4).  This is the same exact-integer
  discipline the PageRank oracle rounding advisory (ADVICE r4) asked for,
  applied from the start.

Mergeability: sketches are unioned by ``min`` per (group, bucket) —
associative and exact, so per-partition, per-day, or per-snapshot
sketches compose without touching the raw data again (the property HLL
is used for in every web-analytics store).  Intersection cardinality and
Jaccard come from inclusion-exclusion over the union estimate.

Relative error ~ 1/sqrt(B) (12.5% at B=64); bias ~ B/n at small n — the
estimator is for the regime n >> B, which is the only regime that needs
a sketch (tests pin accuracy at n ~ 10^4, B=64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DecimalType

_DEC = DecimalType(38, 0)


def _two63():
    # 2^63 exceeds the BIGINT literal range — route through a string cast
    # (built lazily: Column construction needs an active SparkContext)
    return F.lit("9223372036854775808").cast(_DEC)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    buckets: int = 64,
) -> DataFrame:
    """(group..., bucket, minh) — the sketch relation.

    ONE aggregate with map-side combine; the shuffle carries at most
    |groups| x buckets rows regardless of input size.  NULL values are
    excluded (a NULL is not a member of the distinct set, matching
    ``countDistinct``)."""
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull())
        .select(
            *group_cols,
            F.xxhash64(v).alias("h"),
            F.pmod(F.xxhash64(v, F.lit(1)), F.lit(buckets)).alias("bucket"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.min("h").alias("minh"))
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union two sketches built with the SAME bucket count: elementwise
    min per (group, bucket).  Exact — merge(sketch(A), sketch(B)) equals
    sketch(A UNION B) bit-for-bit (tested), so sketches roll up across
    partitions/days/snapshots without re-reading raw data."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.min("minh").alias("minh"))
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], buckets: int = 64
) -> DataFrame:
    """(group..., buckets_hit, est_distinct) from a sketch relation.

    est_distinct = ROUND(B^2 * 2^64 / S - B, 4) with S the exact integer
    sum described in the module docstring; groups x 1 rows out."""
    hit = F.count(F.lit(1))
    s = (
        F.sum(F.col("minh").cast(_DEC))
        + _two63() * (F.lit(2 * buckets) - hit).cast(_DEC)
    ).cast("double")
    num = F.lit(float(buckets * buckets) * 2.0**64)
    return sketch.groupBy(*group_cols).agg(
        hit.alias("buckets_hit"),
        F.round(num / s - F.lit(buckets), 4).alias("est_distinct"),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    buckets: int = 64,
) -> DataFrame:
    """Inclusion-exclusion over two sketches: per group
    (est_a, est_b, est_union, est_intersect, jaccard_est).

    est_intersect = max(est_a + est_b - est_union, 0); jaccard over the
    union estimate.  Derived from the already-rounded per-side estimates
    so the pure-Python mirror reproduces every digit.  Inner join on the
    group key: overlap is only defined where both sides observed the
    group."""
    ea = kmv_estimate(a, group_cols, buckets).withColumnRenamed(
        "est_distinct", "est_a"
    ).drop("buckets_hit")
    eb = kmv_estimate(b, group_cols, buckets).withColumnRenamed(
        "est_distinct", "est_b"
    ).drop("buckets_hit")
    eu = kmv_estimate(
        kmv_merge(a, b, group_cols), group_cols, buckets
    ).withColumnRenamed("est_distinct", "est_union").drop("buckets_hit")
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4),
        F.lit(0.0),
    )
    return (
        ea.join(eb, group_cols)
        .join(eu, group_cols)
        .select(
            *group_cols,
            "est_a",
            "est_b",
            "est_union",
            inter.alias("est_intersect"),
            F.round(inter / F.col("est_union"), 4).alias("jaccard_est"),
        )
    )
