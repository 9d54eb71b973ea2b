"""Identifier normalization + synonym attachment.

Replaces the reference's per-identifier HTTP calls to the Translator
NodeNorm service (/root/reference/src/dug/core/annotators/_base.py:116-180)
and the name-resolution service (:193-229) with **broadcast left joins**
against small dimension tables — the canonical Spark shape for a
lookup-per-row service.

Semantics preserved:
- normalization hit → identifier rewritten to (preferred_id,
  preferred_label, biolink_type, equivalent_identifiers);
- normalization miss → identifier DROPPED unless its CURIE prefix is on
  the ontology greenlist (monarch_annotator.py:62-74; greenlist
  config.py:134-145);
- synonym miss → empty array (annotators/_base.py:222-229);
- PURL attach: CURIE prefix → PURL base + suffix
  (annotators/utils/biolink_purl_util.py:165-175).

Scale: both lookup tables are bounded by ontology size (≤ tens of M rows,
≪ corpus); `F.broadcast` keeps the join shuffle-free on the 100 TB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# config.py:134-145
ONTOLOGY_GREENLIST = ["PATO", "CHEBI", "MONDO", "UBERON", "HP", "MESH", "UMLS"]

# Representative subset of the reference's prefix→PURL map
# (biolink_purl_util.py:4-163); extend via the `extra` arg.
PURL_MAP = {
    "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
    "GO": "http://purl.obolibrary.org/obo/GO_",
    "HP": "http://purl.obolibrary.org/obo/HP_",
    "MONDO": "http://purl.obolibrary.org/obo/MONDO_",
    "PATO": "http://purl.obolibrary.org/obo/PATO_",
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
    "EFO": "http://www.ebi.ac.uk/efo/EFO_",
    "NCIT": "http://purl.obolibrary.org/obo/NCIT_",
    "ZFA": "http://purl.obolibrary.org/obo/ZFA_",
}


def curie_prefix(col):
    """id_type = id.split(':')[0] (annotators/_base.py:49-51)."""
    return F.split(col, ":").getItem(0)


def normalize_mentions(
    mentions: DataFrame,
    curie_norm: DataFrame,
    greenlist: list[str] | None = None,
) -> DataFrame:
    """MENTIONS × curie_norm → normalized mentions.

    Output columns: url, element_id, search_text, raw_curie, curie
    (preferred), label, biolink_type, equivalent_identifiers, score.
    """
    gl = ONTOLOGY_GREENLIST if greenlist is None else greenlist
    norm = curie_norm.select(
        F.col("curie").alias("_n_curie"),
        "preferred_id",
        "preferred_label",
        "biolink_type",
        "equivalent_identifiers",
    )
    joined = mentions.join(
        F.broadcast(norm), mentions["curie"] == norm["_n_curie"], "left"
    )
    hit = F.col("_n_curie").isNotNull()
    return (
        joined
        # F6: drop normalization failures unless prefix is greenlisted
        .where(hit | curie_prefix(mentions["curie"]).isin(gl))
        .select(
            "url",
            "element_id",
            "search_text",
            mentions["curie"].alias("raw_curie"),
            F.coalesce("preferred_id", mentions["curie"]).alias("curie"),
            F.coalesce("preferred_label", "label").alias("label"),
            F.coalesce(
                "biolink_type", F.element_at(mentions["types"], 1)
            ).alias("biolink_type"),
            F.coalesce(
                "equivalent_identifiers", F.array(mentions["curie"])
            ).alias("equivalent_identifiers"),
            "score",
        )
    )


def attach_synonyms(df: DataFrame, synonyms: DataFrame, on: str = "curie") -> DataFrame:
    """Broadcast left join; missing → empty array (J5)."""
    syn = synonyms.select(F.col("curie").alias("_s_curie"), "names")
    out = df.join(F.broadcast(syn), df[on] == syn["_s_curie"], "left")
    return out.drop("_s_curie").withColumn(
        "synonyms", F.coalesce("names", F.array().cast("array<string>"))
    ).drop("names")


def attach_purl(df: DataFrame, on: str = "curie", extra: dict[str, str] | None = None) -> DataFrame:
    """J6: CURIE prefix → PURL base, concat local suffix; unknown prefix →
    null (biolink_purl_util.py:165-175)."""
    spark = df.sparkSession
    m = dict(PURL_MAP)
    m.update(extra or {})
    purls = spark.createDataFrame(
        list(m.items()), schema="prefix string, purl_base string"
    )
    out = df.withColumn("_prefix", curie_prefix(F.col(on))).join(
        F.broadcast(purls), F.col("_prefix") == purls["prefix"], "left"
    )
    return (
        out.withColumn(
            "purl",
            F.when(
                F.col("purl_base").isNotNull(),
                F.concat("purl_base", F.split(F.col(on), ":").getItem(1)),
            ),
        )
        .drop("_prefix", "prefix", "purl_base")
    )
