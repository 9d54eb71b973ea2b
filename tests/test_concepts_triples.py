"""Term aggregation (SURVEY §2.4 A1-A5) + triple emission semantics."""

from pyspark.sql import functions as F

from dug_spark import fixtures
from dug_spark.operators import annotate, concepts, expand, normalize, triples


def _norm_mentions(spark, rows):
    corpus = spark.createDataFrame(rows, "url string, text string, lang string")
    m = annotate.annotate_mentions(corpus, fixtures.heart_dictionary(spark))
    n = normalize.normalize_mentions(m, fixtures.curie_norm(spark))
    return normalize.attach_synonyms(n, fixtures.synonyms(spark))


def test_concept_search_terms_sorted_dedup(spark):
    m = _norm_mentions(
        spark,
        [("d1", "heart attack", "en"), ("d2", "heart attack again", "en")],
    )
    conc = concepts.build_concepts(m)
    row = conc.where(F.col("concept_id") == "MONDO:0005068").collect()
    # both HP:0001658 and MONDO:0005068 normalize to MONDO:0005068 —
    # grouped into one concept
    assert len(row) == 1
    terms = row[0]["search_terms"]
    # sorted(set(search_text ∪ synonyms)) (parsers/_base.py:116-121)
    assert terms == sorted(set(terms))
    assert "heart attack" in terms
    assert "myocardial infarction" in terms  # synonym of MONDO:0005068


def test_element_concept_edges_distinct(spark):
    m = _norm_mentions(spark, [("d1", "heart heart heart", "en")])
    e = concepts.element_concept_edges(m)
    rows = e.collect()
    assert len(rows) == len({(r["element_id"], r["curie"]) for r in rows})


def test_element_search_terms_inherit_concept_terms(spark):
    m = _norm_mentions(spark, [("d1", "asthma", "en")])
    conc = concepts.build_concepts(m)
    edges = concepts.element_concept_edges(m)
    est = concepts.element_search_terms(edges, conc)
    row = est.collect()[0]
    # A3: concept name + concept search_terms, sorted set
    assert "asthma" in row["search_terms"]
    assert "bronchial asthma" in row["search_terms"]
    assert row["search_terms"] == sorted(set(row["search_terms"]))


def test_has_concept_triples(spark):
    m = _norm_mentions(spark, [("d1", "asthma and lung", "en")])
    t = triples.has_concept_triples(m)
    got = {(r["subj"], r["pred"], r["obj"]) for r in t.collect()}
    assert ("d1", "HAS_CONCEPT", "MONDO:0004979") in got
    assert ("d1", "HAS_CONCEPT", "UBERON:0002048") in got


def test_subclass_triples_only_live_concepts(spark):
    m = _norm_mentions(spark, [("d1", "asthma", "en")])
    t = triples.subclass_triples(m, fixtures.kg_edges(spark))
    got = {(r["subj"], r["obj"]) for r in t.collect()}
    assert got == {("MONDO:0004979", "MONDO:0000001")}


def test_co_mention_pairs_canonical_order(spark):
    m = _norm_mentions(spark, [("d1", "asthma and lung", "en")])
    t = triples.co_mention_triples(m)
    got = {(r["subj"], r["obj"]) for r in t.collect()}
    assert ("MONDO:0004979", "UBERON:0002048") in got
    for s, o in got:
        assert s < o


def test_expand_concepts_templates(spark):
    ids = spark.createDataFrame(
        [("MONDO:0005068", "MONDO:0005068"), ("CHEBI:15365", "CHEBI:15365")],
        "concept_id string, curie string",
    )
    ans = expand.expand_concepts(
        ids, fixtures.kg_edges(spark), fixtures.kg_nodes(spark)
    )
    rows = ans.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_name"], set()).add((r["subject"], r["object"]))
    # disease→phenotypic_feature template finds the has_phenotype edge
    assert ("MONDO:0005068", "HP:0001658") in by_q.get("disease", set())
    # disease→anatomical_entity template (anat)
    assert ("MONDO:0005068", "UBERON:0000948") in by_q.get("anat", set())
    # chemical→disease templates
    assert ("CHEBI:15365", "MONDO:0005068") in by_q.get("chem_to_disease", set())


def test_expand_excludes_configured_identifiers(spark):
    ids = spark.createDataFrame(
        [("CHEBI:17336", "CHEBI:17336")], "concept_id string, curie string"
    )
    ans = expand.expand_concepts(ids, fixtures.kg_edges(spark), fixtures.kg_nodes(spark))
    assert ans.count() == 0  # F3: default exclude list (config.py:92)


def test_answer_id_shape_and_dedup(spark):
    ids = spark.createDataFrame(
        [("MONDO:0005068", "MONDO:0005068"), ("MONDO:0005068", "MONDO:0005068")],
        "concept_id string, curie string",
    )
    ans = expand.expand_concepts(ids, fixtures.kg_edges(spark), fixtures.kg_nodes(spark))
    rows = ans.where(F.col("query_name") == "disease").collect()
    # A6: dedup on (concept_id, answer_id); id = subj_obj_query
    assert len(rows) == 1
    assert rows[0]["answer_id"] == "MONDO:0005068_HP:0001658_disease"


def test_concept_optional_terms(spark):
    ids = spark.createDataFrame(
        [("MONDO:0005068", "MONDO:0005068")], "concept_id string, curie string"
    )
    ans = expand.expand_concepts(ids, fixtures.kg_edges(spark), fixtures.kg_nodes(spark))
    opt = concepts.concept_optional_terms(ans)
    row = opt.collect()[0]
    # A4: node names ∪ synonyms, sorted set
    assert "Myocardial infarction" in row["optional_terms"]
    assert row["optional_terms"] == sorted(set(row["optional_terms"]))


def test_co_mention_similarity_hand_checked(spark):
    # 4 docs: A+B together twice, A alone once, B+C once
    m = spark.createDataFrame(
        [
            ("d1", "A"), ("d1", "B"),
            ("d2", "A"), ("d2", "B"),
            ("d3", "A"),
            ("d4", "B"), ("d4", "C"),
        ],
        "element_id string, curie string",
    )
    got = {
        (r["src"], r["dst"]): (r["n_co"], r["cosine"], r["jaccard"], r["dice"])
        for r in triples.co_mention_similarity(m).collect()
    }
    # c_A=3, c_B=3, c_C=1; AB co=2, BC co=1
    import math

    assert got[("A", "B")] == (
        2,
        round(2 / math.sqrt(9), 5),
        round(2 / 4, 5),
        round(4 / 6, 5),
    )
    assert got[("B", "C")] == (
        1,
        round(1 / math.sqrt(3), 5),
        round(1 / 3, 5),
        round(2 / 4, 5),
    )
    assert ("A", "C") not in got  # never co-mentioned


def test_co_mention_similarity_always_together_is_one(spark):
    m = spark.createDataFrame(
        [("d1", "X"), ("d1", "Y"), ("d2", "X"), ("d2", "Y")],
        "element_id string, curie string",
    )
    rows = triples.co_mention_similarity(m).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cosine"], r["jaccard"], r["dice"]) == (1.0, 1.0, 1.0)


# --- N-Triples serialization -------------------------------------------------


def test_to_ntriples_format(spark):
    from dug_spark.operators.triples import to_ntriples

    t = spark.createDataFrame(
        [
            ("https://example.org/doc/1", "HAS_CONCEPT", "OP:0001"),
            ("MONDO:0005", "biolink:subclass_of", "MONDO:0001"),
            ("a b<c>", "p", "o\\q"),
        ],
        "subj string, pred string, obj string",
    )
    lines = [r["line"] for r in to_ntriples(t).collect()]
    assert lines[0] == (
        "<https://example.org/doc/1> "
        "<https://example.org/pred/HAS_CONCEPT> "
        "<https://example.org/id/OP:0001> ."
    )
    assert lines[1] == (
        "<https://example.org/id/MONDO:0005> "
        "<https://example.org/pred/biolink:subclass_of> "
        "<https://example.org/id/MONDO:0001> ."
    )
    # forbidden IRIREF chars percent-encode
    assert lines[2] == (
        "<https://example.org/id/a%20b%3Cc%3E> "
        "<https://example.org/pred/p> "
        "<https://example.org/id/o%5Cq> ."
    )
    # every line is well-formed N-Triples: three <IRI> tokens + ' .'
    import re
    for ln in lines:
        assert re.fullmatch(r"<[^<>\s]+> <[^<>\s]+> <[^<>\s]+> \.", ln)


def test_kg_diff_added_removed(spark):
    from dug_spark.operators.triples import kg_diff

    old = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "q", "z"), ("b", "q", "z")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("a", "p", "x"), ("c", "p", "w")],
        "subj string, pred string, obj string",
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["change"])
        for r in kg_diff(old, new).collect()
    }
    assert got == {
        ("c", "p", "w", "added"),
        ("a", "p", "y", "removed"),
        ("b", "q", "z", "removed"),  # multiplicity collapses: ONE removed row
    }


def test_provenance_rollup(spark):
    from pyspark.sql import functions as F

    from dug_spark.operators import triples as T

    rows = [
        # (subj, pred, obj, doc_id, ts)
        ("a", "p", "b", "d1", 10),
        ("a", "p", "b", "d1", 12),   # second mention, same doc
        ("a", "p", "b", "d2", 30),
        ("x", "p", "y", "d3", 5),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, doc_id string, ts long"
    )
    got = {
        (r.subj, r.obj): (r.n_docs, r.n_mentions, r.first_seen, r.last_seen, r.confidence)
        for r in T.provenance_rollup(df, ts_col="ts").collect()
    }
    assert got[("a", "b")] == (2, 3, 10, 30, round(2 / 7, 6))
    assert got[("x", "y")] == (1, 1, 5, 5, round(1 / 6, 6))
    # min_docs gate
    assert T.provenance_rollup(df, min_docs=2).count() == 1
    # increment composability: rollup(old ∪ new) equals rollup over all
    old = df.where(F.col("ts") < 20)
    new = df.where(F.col("ts") >= 20)
    merged = {
        (r.subj, r.obj): (r.n_docs, r.n_mentions, r.confidence)
        for r in T.provenance_rollup(old.unionByName(new)).collect()
    }
    direct = {
        (r.subj, r.obj): (r.n_docs, r.n_mentions, r.confidence)
        for r in T.provenance_rollup(df).collect()
    }
    assert merged == direct
