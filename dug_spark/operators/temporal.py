"""Temporal joins Spark lacks as built-ins: as-of join and bucketed
range join.

Web-crawl pipelines are capture-time-keyed (BASELINE input:
(url, warc_ts, html, text)) and constantly ask point-in-time questions —
"which crawl of this URL was current when the query/annotation
happened", "which links were live inside this capture window".  The
reference pipeline is one-shot batch and never needed them; at 10^12
captures they are core operators.

Both are expressed as compositions of existing DataFrame ops (the
preferred tier of the custom-operator policy — no Python in the hot
path):

- ``asof_join``: the union-window formulation — tag both sides, union,
  ONE hash partition by key + ONE in-partition sort by (ts, side), then
  ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
  window carries the latest right row forward onto every left row.
  Cost: one shuffle of |left|+|right| rows, no join explosion, no
  per-key driver work — the plan shape pandas' merge_asof would need a
  single machine for.
- ``range_join_bucketed``: equi-join on (key, bucket) after exploding
  each right interval into the fixed-width buckets it covers, then the
  exact range predicate.  This is the standard bucketed rewrite of the
  otherwise quadratic per-key interval join: a left point probes exactly
  ONE bucket, so the shuffle is |left| + Σ interval_width/bucket_width
  rows instead of |left|×|right| per hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _epoch(df: DataFrame, col: str):
    """Column as epoch seconds (double) whatever its type: numeric passes
    through; TIMESTAMP casts directly; TIMESTAMP_NTZ (what parquet reads
    as) goes via TIMESTAMP first — identity under the session's UTC
    timezone (session.py pins spark.sql.session.timeZone=UTC)."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, TimestampNTZType):
        c = c.cast(TimestampType())
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the payload of the
    LATEST right row of the same key with right_ts <= left_ts (ties at
    equal timestamps match, like DuckDB's ``ASOF JOIN ... >=``), or
    NULLs when no prior right row exists (left-outer semantics).

    Right rows are first reduced to one per (key, right_ts) by taking
    the max payload struct — a deterministic tie rule both engines can
    state (the oracle mirrors it with max_by).

    ``tolerance_seconds`` voids matches older than the window
    (left_ts - right_ts > tolerance ⇒ NULL payload), the merge_asof
    ``tolerance`` semantics.

    Output: left.* + payload_cols + ``matched_ts`` (the matched right
    timestamp, NULL when unmatched).
    """
    rdedup = (
        right.groupBy(key, right_ts)
        .agg(F.max(F.struct(*payload_cols)).alias("_p"))
        .select(
            key,
            F.col(right_ts).alias("_ts"),
            F.struct(F.col(right_ts).alias("_mts"), F.col("_p").alias("_pv")).alias(
                "_r"
            ),
        )
        .withColumn("_side", F.lit(0))
    )
    lcols = left.columns
    ltagged = left.select(
        F.col(key).alias(key) if key in lcols else F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(rdedup.schema["_r"].dataType).alias("_r"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
    )
    rtagged = rdedup.select(
        key, "_ts", "_r", "_side", F.lit(None).cast(ltagged.schema["_l"].dataType).alias("_l")
    )
    # right (side 0) sorts before left (side 1) at equal ts ⇒ ties match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        ltagged.unionByName(rtagged)
        .withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    matched = F.col("_last_r")
    if tolerance_seconds is not None:
        def _ep(c):
            from pyspark.sql.types import TimestampNTZType as _NTZ
            dt = left.schema[left_ts].dataType
            col = F.col(c)
            if isinstance(dt, _NTZ):
                col = col.cast("timestamp")
            return col.cast("double")

        age = _ep("_ts") - _ep("_last_r._mts")
        matched = F.when(age <= F.lit(float(tolerance_seconds)), matched)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in lcols]
    out_cols += [matched[f"_pv"][c].alias(c) for c in payload_cols]
    out_cols.append(matched["_mts"].alias("matched_ts"))
    return joined.select(*out_cols)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Interval join ``left.key = right.key AND start <= point < end``
    via fixed-width bucketing: the right interval explodes into the
    buckets it covers (``sequence(floor(start/w), floor(end/w))``), the
    left point probes its single bucket with an ordinary equi-join on
    (key, bucket), and the exact predicate filters the bucket-boundary
    false positives.  Identical output to the naive range join (tested),
    but the join is hash-partitioned and AQE-skew-splittable instead of
    a per-key nested loop.

    ``bucket_width`` trades explode factor against probe selectivity —
    pick it near the median interval width so intervals cover O(1)
    buckets.  point/start/end must be numeric (cast timestamps to epoch
    seconds first).
    """
    p = F.col(point_col).cast("double")
    s = F.col(start_col).cast("double")
    e = F.col(end_col).cast("double")
    w = float(bucket_width)
    lb = left.withColumn("_b", F.floor(p / F.lit(w)).cast("long"))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(s / F.lit(w)).cast("long"), F.floor(e / F.lit(w)).cast("long")
            )
        ),
    )
    cond = (s <= p) & (p < e)
    return lb.join(rb, [key, "_b"]).where(cond).drop("_b")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Batch gap-based sessionization (the batch twin of
    streaming/ingest.sessionize_events): rows of the same key whose
    timestamps are within ``gap_seconds`` of the previous row belong to
    one session.  session_seq is the classic cumulative sum over the
    new-session indicator (lag window), numbered 1..n per key in time
    order.

    Scale shape: ONE shuffle keyed by ``key`` + an in-partition sort by
    ts; both windows (lag, running sum) share the same partitioning, so
    Catalyst plans a single Exchange.  Keys are users/hosts — near-unique
    at web scale, skew-free.  Output: input columns + session_seq.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    ep = _epoch(df, ts_col)
    prev = F.lag(ep).over(w)
    new_sess = F.when(
        prev.isNull() | (ep - prev > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
