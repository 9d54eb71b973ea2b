"""KG expansion: concept → related-node answers via the ontology triple
table (replaces TranQL HTTP graph queries).

The reference runs, per concept identifier × 7 query templates
(config.py:94-104), a remote 2-node TranQL query
``select s->o from kg where s='CURIE'`` (crawler.py:178-201, query text
tranql.py:257-286) and parses the TRAPI answer (tranql.py:13-105).  A
query is valid only when the CURIE prefix is allowed for the source type
(tranql.py:242-255, prefix map :205-212); configured identifiers are
excluded (crawler.py:183-185, config.py:92).

Spark-native: ONE join of the identifier set against the ``kg_edges``
triple table covers all templates — the template list becomes a filter on
(source-prefix, object-category) pairs.  This is the engine's only
potentially-large join (kg_edges at ontology scale, identifiers at corpus
scale); AQE skew-join plus optional salting (plans/skew.py) handle hot
CURIEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference templates: name → (source biolink type, object biolink type)
# (config.py:94-104).
DEFAULT_QUERIES: dict[str, tuple[str, str]] = {
    "disease": ("disease", "phenotypic_feature"),
    "pheno": ("phenotypic_feature", "disease"),
    "anat": ("disease", "anatomical_entity"),
    "chem_to_disease": ("chemical_entity", "disease"),
    "small_molecule_to_disease": ("small_molecule", "disease"),
    "chemical_mixture_to_disease": ("chemical_mixture", "disease"),
    "phen_to_anat": ("phenotypic_feature", "anatomical_entity"),
}

# Valid CURIE prefixes per source type (tranql.py:205-212).
CURIE_PREFIXES: dict[str, list[str]] = {
    "disease": ["MONDO", "ORPHANET", "DOID"],
    "phenotypic_feature": ["HP", "HPO", "EFO"],
    "anatomical_entity": ["UBERON"],
    "chemical_entity": ["CHEBI", "PUBCHEM.COMPOUND"],
    "small_molecule": ["CHEBI", "PUBCHEM.COMPOUND"],
    "chemical_mixture": ["CHEBI"],
    "gene": ["NCBIGene", "ENSEMBL"],
}

_SNAKE_TO_CLASS = {
    "disease": "biolink:Disease",
    "phenotypic_feature": "biolink:PhenotypicFeature",
    "anatomical_entity": "biolink:AnatomicalEntity",
    "chemical_entity": "biolink:ChemicalEntity",
    "small_molecule": "biolink:SmallMolecule",
    "chemical_mixture": "biolink:ChemicalMixture",
    "gene": "biolink:Gene",
    "publication": "biolink:Publication",
}


def _template_table(spark, queries: dict[str, tuple[str, str]], prefixes: dict[str, list[str]]):
    rows = []
    for qname, (src_type, obj_type) in queries.items():
        for pfx in prefixes.get(src_type, []):
            rows.append((qname, src_type, obj_type, pfx, _SNAKE_TO_CLASS.get(obj_type, obj_type)))
    return spark.createDataFrame(
        rows,
        schema="query_name string, source_type string, object_type string, "
        "source_prefix string, object_category string",
    )


def expand_concepts(
    identifiers: DataFrame,
    kg_edges: DataFrame,
    kg_nodes: DataFrame,
    queries: dict[str, tuple[str, str]] | None = None,
    exclude_identifiers: list[str] | None = None,
    curie_prefixes: dict[str, list[str]] | None = None,
) -> DataFrame:
    """identifiers(concept_id, curie) × kg → kg_answers.

    Output: (concept_id, query_name, answer_id, subject, predicate,
    object, node_names array, node_synonyms array) — one row per TRAPI
    answer (2-node subgraph), answer_id = '{subj}_{obj}_{query}' matching
    the reference's order-sensitive id (parsers/_base.py:106-110 with
    node order = query order subj,obj).
    """
    spark = identifiers.sparkSession
    tmpl = _template_table(
        spark, queries or DEFAULT_QUERIES, curie_prefixes or CURIE_PREFIXES
    )
    ids = identifiers.select("concept_id", "curie").distinct()
    excl = exclude_identifiers or ["CHEBI:17336"]  # config.py:92
    ids = ids.where(~F.col("curie").isin(excl))  # F3

    # F4: CURIE prefix must be valid for the template's source type
    ids_t = ids.join(
        F.broadcast(tmpl),
        F.split(F.col("curie"), ":").getItem(0) == tmpl["source_prefix"],
    )

    # the expansion join: 1-hop edges out of each identifier
    edges = kg_edges.select(
        F.col("subject"), F.col("predicate"), F.col("object"), F.col("publications")
    )
    hop = ids_t.join(edges, ids_t["curie"] == edges["subject"])

    # F8: object node must carry the template's target category
    nodes = kg_nodes.select(
        F.col("id").alias("_obj_id"),
        F.col("name").alias("node_name"),
        F.col("category"),
        F.col("synonyms").alias("node_syns"),
    )
    hop = hop.join(F.broadcast(nodes), hop["object"] == nodes["_obj_id"]).where(
        F.array_contains(
            F.transform("category", lambda c: F.lower(c)),
            F.lower(F.col("object_category")),
        )
        | F.array_contains("category", F.col("object_type"))
    )

    answers = hop.select(
        "concept_id",
        "query_name",
        F.concat_ws("_", "curie", "object", "query_name").alias("answer_id"),
        F.col("curie").alias("subject"),
        "predicate",
        "object",
        F.array("node_name").alias("node_names"),
        F.coalesce("node_syns", F.array().cast("array<string>")).alias("node_synonyms"),
    )
    # A6: first-wins dedup on answer_id per concept
    return answers.dropDuplicates(["concept_id", "answer_id"])


def nodes_to_elements(
    kg_answers: DataFrame,
    kg_nodes: DataFrame,
    node_type: str = "biolink:Publication",
    curie_prefix: str = "HEALCDE",
    data_type: str = "cde",
) -> DataFrame:
    """J9: cast qualifying answer nodes into new elements
    (crawler.py:203-276; config node_to_element_queries config.py:106-125).

    attribute_mapping: name←name, desc←summary, collection_*←cde_category,
    action←files with list_field_choose_first (element_at 1).
    """
    nodes = kg_nodes.where(
        F.array_contains("category", node_type)
        & F.col("id").startswith(curie_prefix)
    )
    hit_ids = kg_answers.select(F.col("object").alias("id")).distinct()
    cast = nodes.join(hit_ids, "id", "left_semi")
    attr = lambda k: F.coalesce(F.element_at("attributes", k), F.lit(""))
    return cast.select(
        F.col("id").alias("element_id"),
        F.col("name").alias("element_name"),
        attr("summary").alias("element_desc"),
        F.lit(data_type).alias("data_type"),
        attr("cde_category").alias("collection_id"),
        attr("cde_category").alias("collection_name"),
        F.lit("").alias("collection_desc"),
        attr("files").alias("element_action"),
        F.lit("").alias("collection_action"),
        F.col("attributes").alias("metadata"),
    )
