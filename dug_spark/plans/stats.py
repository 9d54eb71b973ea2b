"""Single-pass column statistics (ANALYZE TABLE for the KG tables).

Table formats and cost-based planners live on column statistics — NDV
for join sizing, null counts for filter selectivity, min/max for range
pruning, average length for row-size estimates.  At 100 TB you cannot
afford one pass per column: this module computes every column's stats
in ONE aggregation over the table (Spark evaluates the whole aggregate
list in a single partial+final agg pass — one shuffle of one row per
partition).

NDV is collected two ways: exact ``count(distinct)`` — which Spark
executes via expand (one input replica per distinct-column) so its cost
grows with column count — and ``approx_count_distinct`` (HyperLogLog++,
constant per-row cost, mergeable partials), with ``exact_ndv=False``
the 100 TB default.  The oracle gates the exact variant; the HLL
variant is plan-shape + error-bound tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, ndv, min_str,
    max_str, avg_len) — min/max/length on the string form so one schema
    covers heterogeneous columns (a planner consumes them per-type; the
    string form is what manifest files store anyway).

    One aggregation pass; with ``exact_ndv=False`` the NDV terms are
    HLL++ sketches and the pass stays one-replica regardless of column
    count."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        sc = F.col(c).cast("string")
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        if exact_ndv:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__ndv"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__ndv"))
        aggs.append(F.min(sc).alias(f"{c}__min"))
        aggs.append(F.max(sc).alias(f"{c}__max"))
        aggs.append(F.avg(F.length(sc)).alias(f"{c}__len"))
    row = df.agg(*aggs)
    # pivot the single wide row to one row per column — manifest-scale
    per_col = []
    for c in cols:
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").cast("long").alias("ndv"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
                F.round(F.col(f"{c}__len"), 4).alias("avg_len"),
            )
        )
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
