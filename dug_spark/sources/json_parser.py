"""RADx-style nested-JSON parser.

Reference: /root/reference/src/dug/core/parsers/radx_parser.py:15-57 —
records[] × studies[] cross-product → one element per pair; each record's
terms[] become concepts with pre-set synonyms; record metadata (datatype,
cardinality, section, enumeration) carried as a string map ("treat all
attributes as strings", :48-55).

Spark-native: spark.read.json + explode('records') × explode('studies')
(the cross-product IS the double explode) + explode_outer('terms').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_radx_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(elements, concepts) from a RADx-shaped JSON file."""
    raw = spark.read.option("multiLine", "true").json(path)
    rec = raw.select(F.explode("records").alias("r"))
    pairs = rec.select("r", F.explode("r.studies").alias("s"))
    elements = pairs.select(
        F.col("r.id").alias("element_id"),
        F.col("r.name").alias("element_name"),
        F.lower(F.coalesce(F.col("r.description"), F.lit(""))).alias("element_desc"),
        F.lit("RADx").alias("data_type"),
        F.col("s.id").alias("collection_id"),
        F.col("s.name").alias("collection_name"),
        F.coalesce(F.col("s.description"), F.lit("")).alias("collection_desc"),
        F.lit("").alias("element_action"),
        F.lit("").alias("collection_action"),
        F.map_from_arrays(
            F.array(F.lit("datatype"), F.lit("cardinality"), F.lit("section")),
            F.array(
                F.coalesce(F.col("r.metadata.datatype").cast("string"), F.lit("")),
                F.coalesce(F.col("r.metadata.cardinality").cast("string"), F.lit("")),
                F.coalesce(F.col("r.metadata.section").cast("string"), F.lit("")),
            ),
        ).alias("metadata"),
    )
    concepts = (
        rec.select(F.explode_outer("r.terms").alias("t"))
        .where(F.col("t").isNotNull())
        .select(
            F.col("t.id").alias("concept_id"),
            F.col("t.label").alias("name"),
            F.coalesce(F.col("t.description"), F.lit("")).alias("description"),
            F.coalesce(F.col("t.type"), F.lit("")).alias("type"),
            F.coalesce(F.col("t.synonyms"), F.array().cast("array<string>")).alias(
                "search_terms"
            ),
            F.array().cast("array<string>").alias("optional_terms"),
        )
        .dropDuplicates(["concept_id"])
    )
    return elements, concepts
