"""Index sinks: the reference's three Elasticsearch indexes re-expressed
as MERGE-semantics table writes.

Reference behaviors preserved:
- index_element (index.py:209-222): upsert — when the element doc exists,
  the identifier list becomes the DEDUPED UNION of old+new (:219-222);
- index_concept (index.py:199-207): insert-if-absent (existing row wins);
- index_kg_answer (index.py:224-246): append with doc id = concept_id +
  answer node ids, search_targets deduped (:227-233).

On Iceberg these are literal ``MERGE INTO`` statements (documented on each
function); this container has no Iceberg runtime, so the same semantics
are implemented as full-outer/anti-join writes over parquet — plan shape
is identical (one shuffle on the merge key), only the commit protocol
differs (atomic dir rename vs snapshot commit).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    tmp = path + ".tmp-merge"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def merge_elements(spark: SparkSession, path: str, batch: DataFrame) -> DataFrame:
    """S14: upsert elements; on match, identifiers = deduped union.

    Iceberg form:
        MERGE INTO elements t USING batch s ON t.element_id = s.element_id
        WHEN MATCHED THEN UPDATE SET identifiers =
            array_distinct(array_union(t.identifiers, s.identifiers)), ...
        WHEN NOT MATCHED THEN INSERT *
    """
    batch = batch.dropDuplicates(["element_id"])
    if not os.path.exists(path):
        _atomic_overwrite(batch, path)
        return spark.read.parquet(path)
    old = spark.read.parquet(path)
    b = batch.select(
        F.col("element_id").alias("_id"),
        *[F.col(c).alias(f"_new_{c}") for c in batch.columns if c != "element_id"],
    )
    merged = old.join(b, old["element_id"] == b["_id"], "full_outer")
    out_cols = [F.coalesce("element_id", "_id").alias("element_id")]
    # schema evolution: batch-only columns are kept (Iceberg MERGE with
    # schema evolution adds them as nullable), not silently dropped
    all_cols = list(old.columns) + [
        c for c in batch.columns if c not in old.columns
    ]
    for c in all_cols:
        if c == "element_id":
            continue
        if c not in old.columns:
            out_cols.append(F.col(f"_new_{c}").alias(c))
            continue
        if c not in batch.columns:
            out_cols.append(F.col(c))
            continue
        if c == "identifiers":
            out_cols.append(
                F.array_distinct(
                    F.array_union(
                        F.coalesce(c, F.array().cast("array<string>")),
                        F.coalesce(f"_new_{c}", F.array().cast("array<string>")),
                    )
                ).alias(c)
            )
        else:
            # new value wins on match (ES reindex overwrites the doc)
            out_cols.append(F.coalesce(f"_new_{c}", F.col(c)).alias(c))
    _atomic_overwrite(merged.select(out_cols), path)
    return spark.read.parquet(path)


def insert_concepts_if_absent(
    spark: SparkSession, path: str, batch: DataFrame
) -> DataFrame:
    """S15: insert-if-absent (index.py:199-207 — skip when id exists).

    Iceberg form: MERGE ... WHEN NOT MATCHED THEN INSERT *.
    """
    batch = batch.dropDuplicates(["concept_id"])
    if not os.path.exists(path):
        _atomic_overwrite(batch, path)
        return spark.read.parquet(path)
    old = spark.read.parquet(path)
    fresh = batch.join(old.select("concept_id"), "concept_id", "left_anti")
    _atomic_overwrite(old.unionByName(fresh), path)
    return spark.read.parquet(path)


def append_kg_answers(spark: SparkSession, path: str, answers: DataFrame) -> DataFrame:
    """S16: kg_answer docs — id = concept_id + '_' + answer nodes
    (index.py:236-244), search_targets deduped (:227-233); idempotent
    append via anti-join on the doc id."""
    docs = answers.select(
        F.concat_ws(
            "_", "concept_id", F.col("subject"), F.col("object")
        ).alias("doc_id"),
        "concept_id",
        F.array_distinct(
            F.array_union("node_names", "node_synonyms")
        ).alias("search_targets"),
        "subject",
        "predicate",
        "object",
        "query_name",
    ).dropDuplicates(["doc_id"])
    if not os.path.exists(path):
        _atomic_overwrite(docs, path)
        return spark.read.parquet(path)
    old = spark.read.parquet(path)
    fresh = docs.join(old.select("doc_id"), "doc_id", "left_anti")
    _atomic_overwrite(old.unionByName(fresh), path)
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write a table bucketed (and sorted) on its join key.

    The 100 TB co-location story: element↔concept joins and repeated
    concept-keyed aggregations shuffle on `curie` every run unless both
    sides are bucketed on it — with matching bucket counts Spark plans a
    sort-merge join with NO Exchange on either side (bucket pruning also
    applies to point lookups).  On Iceberg the equivalent is a
    `bucket(N, col)` partition transform + storage-partitioned joins.
    Hive-style bucketing requires saveAsTable (bucket metadata lives in
    the catalog, not the parquet files).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> bool:
    """True iff joining the two bucketed tables on `key` plans without a
    shuffle on either side (diagnostic used by tests and plan audits)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left_table)
            .join(spark.table(right_table), key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return "Exchange" not in plan
