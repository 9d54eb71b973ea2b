"""TOPMed tab-separated variable parsers.

- parse_topmed_csv: TSV → elements only
  (/root/reference/src/dug/core/parsers/topmed_csv_parser.py:13-50).
- parse_topmed_tags: TSV of variables + adjacent tags JSON; tags become
  concepts 'TOPMED.TAG:{pk}' with description-as-search-term and
  instructions-as-optional-term, variables join to their tag by tag_pk,
  dangling tag_pk is an error
  (/root/reference/src/dug/core/parsers/topmed_tag_parser.py:15-85).

Spark-native: spark.read.csv(sep='\\t') + spark.read.json + an inner
equi-join on tag_pk; the reference's per-variable error loop (:72-79)
becomes one left-anti dangling-key check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DBGAP_VAR_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi"
_DBGAP_STUDY_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi"


class DanglingTagError(Exception):
    """A variable references a tag_pk with no tag (topmed_tag_parser.py:75-79)."""


def _read_variables(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.csv(path, sep="\t", header=True)


def parse_topmed_csv(spark: SparkSession, path: str) -> DataFrame:
    """TSV → ELEMENTS (topmed_csv_parser.py:13-50): element per row,
    dbGaP-style action links from the accession columns."""
    v = _read_variables(spark, path)
    phv = F.regexp_extract("variable_full_accession", r"phv(\d+)", 1)
    return v.select(
        F.col("variable_full_accession").alias("element_id"),
        F.coalesce("variable_name", F.col("variable_phv")).alias("element_name"),
        F.lower(F.coalesce("variable_desc", F.lit(""))).alias("element_desc"),
        F.lit("TOPMed").alias("data_type"),
        F.col("study_full_accession").alias("collection_id"),
        F.col("study_name").alias("collection_name"),
        F.lit("").alias("collection_desc"),
        F.concat(
            F.lit(f"{_DBGAP_VAR_URL}?study_id="),
            "study_full_accession",
            F.lit("&phv="),
            phv,
        ).alias("element_action"),
        F.concat(
            F.lit(f"{_DBGAP_STUDY_URL}?study_id="), "study_full_accession"
        ).alias("collection_action"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )


def parse_topmed_tags(
    spark: SparkSession, variables_path: str, tags_path: str
) -> tuple[DataFrame, DataFrame]:
    """(elements, concepts): tags → concepts 'TOPMED.TAG:{pk}', variables
    joined to tags on tag_pk (inner equi-join, J3); raises
    DanglingTagError when a variable's tag_pk has no tag."""
    v = _read_variables(spark, variables_path)
    tags = spark.read.option("multiLine", "true").json(tags_path)
    concepts = tags.select(
        F.concat(F.lit("TOPMED.TAG:"), F.col("pk").cast("string")).alias("concept_id"),
        F.col("fields.title").alias("name"),
        F.col("fields.description").alias("description"),
        F.lit("TOPMed Phenotype Concept").alias("type"),
        F.array(F.col("fields.description")).alias("search_terms"),
        F.array(F.col("fields.instructions")).alias("optional_terms"),
        F.col("pk").cast("string").alias("tag_pk"),
    )

    dangling = v.join(
        concepts.select("tag_pk"), "tag_pk", "left_anti"
    ).select("tag_pk").distinct()
    bad = [r["tag_pk"] for r in dangling.limit(5).collect()]
    if bad:
        raise DanglingTagError(f"Variables reference unknown tag_pk values: {bad}")

    joined = v.join(concepts.select("tag_pk", "concept_id"), "tag_pk", "inner")
    elements = joined.select(
        F.col("variable_full_accession").alias("element_id"),
        F.col("variable_name").alias("element_name"),
        F.lower(F.coalesce("variable_desc", F.lit(""))).alias("element_desc"),
        F.lit("TOPMed").alias("data_type"),
        F.col("study_full_accession").alias("collection_id"),
        F.col("study_name").alias("collection_name"),
        F.lit("").alias("collection_desc"),
        F.lit("").alias("element_action"),
        F.lit("").alias("collection_action"),
        F.create_map(F.lit("tag_concept"), "concept_id").alias("metadata"),
    )
    return elements, concepts.drop("tag_pk")
