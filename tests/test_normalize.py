"""Normalization / synonym / canonicalization semantics vs the reference
(annotators/_base.py:116-229, monarch_annotator.py:62-74)."""

from pyspark.sql import functions as F

from dug_spark import fixtures
from dug_spark.operators import annotate, canonicalize, normalize


def _mentions(spark, text="heart attack and asthma"):
    corpus = spark.createDataFrame(
        [("d1", text, "en")], "url string, text string, lang string"
    )
    return annotate.annotate_mentions(corpus, fixtures.heart_dictionary(spark))


def test_normalization_rewrites_to_preferred(spark):
    m = _mentions(spark)
    n = normalize.normalize_mentions(m, fixtures.curie_norm(spark))
    rows = {r["raw_curie"]: r for r in n.collect()}
    # UBERON:0007100 → itself, with label/type from the norm table
    # (reference golden test_annotators.py:43-61)
    r = rows["UBERON:0007100"]
    assert r["curie"] == "UBERON:0007100"
    assert r["label"] == "primary circulatory organ"
    assert r["biolink_type"] == "anatomical entity"
    # UBERON:0015230 normalizes to a different preferred id
    assert rows["UBERON:0015230"]["curie"] == "UBERON:0000948"
    # HP:0001658 normalizes into MONDO:0005068
    assert rows["HP:0001658"]["curie"] == "MONDO:0005068"


def test_greenlist_drops_unlisted_failures(spark):
    m = _mentions(spark)
    n = normalize.normalize_mentions(m, fixtures.curie_norm(spark))
    raw = {r["raw_curie"] for r in n.collect()}
    # ZFA:0000114 has no norm row and ZFA is not greenlisted → dropped
    assert "ZFA:0000114" not in raw
    # XCO is also unlisted → dropped even before the score filter
    assert "XCO:0000001" not in raw


def test_greenlist_keeps_listed_failures(spark):
    corpus = spark.createDataFrame(
        [("d1", "aspirin daily", "en")], "url string, text string, lang string"
    )
    m = annotate.annotate_mentions(corpus, fixtures.heart_dictionary(spark))
    # remove CHEBI:15365 from the norm table → normalization fails, but
    # CHEBI is greenlisted (config.py:134-145) → identifier survives as-is
    norm = fixtures.curie_norm(spark).where(F.col("curie") != "CHEBI:15365")
    n = normalize.normalize_mentions(m, norm)
    rows = n.collect()
    assert len(rows) == 1
    assert rows[0]["curie"] == "CHEBI:15365"
    assert rows[0]["label"] == "acetylsalicylic acid"


def test_synonym_attach(spark):
    m = _mentions(spark)
    n = normalize.normalize_mentions(m, fixtures.curie_norm(spark))
    s = normalize.attach_synonyms(n, fixtures.synonyms(spark))
    by = {r["curie"]: r["synonyms"] for r in s.collect()}
    # reference golden synonym list (tests/unit/conftest.py:195-215)
    assert by["UBERON:0007100"] == [
        "primary circulatory organ", "dorsal tube", "adult heart", "heart",
    ]
    # missing curie → empty array, not null
    assert by["UBERON:0015228"] == []


def test_purl_attach(spark):
    m = _mentions(spark)
    p = normalize.attach_purl(m, on="curie")
    by = {r["curie"]: r["purl"] for r in p.collect()}
    assert by["UBERON:0007100"] == "http://purl.obolibrary.org/obo/UBERON_0007100"
    assert by["XCO:0000001"] is None  # unknown prefix → null purl


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("z", "z2")],
        "src string, dst string",
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comps = {r["id"]: r["comp"] for r in canonicalize.connected_components(edges).collect()}
    assert comps["a"] == comps["b"] == comps["c"] == "a"
    assert comps["x"] == comps["y"] == "x"
    assert comps["z"] == comps["z2"] == "z"


def test_canonical_mapping_merges_equivalents(spark):
    mapping = {
        r["curie"]: r["canonical_id"]
        for r in canonicalize.canonical_mapping(fixtures.curie_norm(spark)).collect()
    }
    # UBERON:0000948 cluster: {0000948, ZFA:0000114, XAO:0000064, 0015230}
    # preferred ids present in component: {UBERON:0000948} → canonical
    assert mapping["UBERON:0015230"] == "UBERON:0000948"
    assert mapping["ZFA:0000114"] == "UBERON:0000948"
    # MONDO:0005068 cluster includes HP:0001658 + UMLS/MESH equivalents
    assert mapping["HP:0001658"] == "MONDO:0005068"
    assert mapping["UMLS:C0027051"] == "MONDO:0005068"


def test_canonicalize_mentions_rewrites(spark):
    m = _mentions(spark, text="heart attack")
    n = normalize.normalize_mentions(m, fixtures.curie_norm(spark))
    c = canonicalize.canonicalize_mentions(n, fixtures.curie_norm(spark))
    curies = {r["curie"] for r in c.collect()}
    # all heart-anatomy variants collapse onto the canonical ids
    assert "UBERON:0015230" not in curies
    assert "UBERON:0000948" in curies


def test_connected_components_raises_on_non_convergence(spark):
    from dug_spark.operators import canonicalize
    import pytest as _pytest

    # a 12-hop chain needs ~11 min-propagation rounds; max_iter=3 must
    # fail loudly instead of returning unconverged (wrong) labels
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    sym = edges.unionByName(
        edges.selectExpr("dst as src", "src as dst")
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        canonicalize.connected_components(sym, max_iter=3)
    # and converges fine with enough rounds
    out = canonicalize.connected_components(sym, max_iter=15)
    assert {r["comp"] for r in out.collect()} == {"n00"}


# --- align_entities (cross-snapshot reciprocal-best matching) ----------------


def test_align_entities_mutual_best(spark):
    from dug_spark.operators.canonicalize import align_entities

    left = spark.createDataFrame(
        [
            (1, "hash join operator"),
            (2, "sort merge join"),
            (3, "window frame spec"),
            (4, "unrelated thing"),
        ],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [
            (101, "hash join operator v2"),   # best for 1
            (102, "sort merge join node"),    # best for 2
            (103, "window frame"),            # best for 3
            (104, "completely different"),    # matches nobody
        ],
        "id long, name string",
    )
    got = {
        (r["left_id"], r["right_id"]): (r["sim"], r["n_shared"])
        for r in align_entities(left, right, min_sim=0.3).collect()
    }
    assert set(got) == {(1, 101), (2, 102), (3, 103)}
    assert got[(1, 101)] == (0.75, 3)   # 3 shared / (3+4-3)
    assert got[(2, 102)] == (0.75, 3)
    assert got[(3, 103)] == (round(2 / 3, 6), 2)


def test_align_entities_reciprocity_and_ties(spark):
    from dug_spark.operators.canonicalize import align_entities

    # two lefts tie for one right: reciprocal-best keeps only the
    # deterministic winner (lower left_id), the loser matches nothing
    left = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(9, "alpha beta gamma")], "id long, name string"
    )
    got = align_entities(left, right, min_sim=0.1).collect()
    assert [(r["left_id"], r["right_id"]) for r in got] == [(1, 9)]
    # duplicate tokens in a name count once (set semantics)
    l2 = spark.createDataFrame([(1, "a a b")], "id long, name string")
    r2 = spark.createDataFrame([(5, "a b")], "id long, name string")
    m = align_entities(l2, r2, min_sim=0.5).collect()
    assert (m[0]["sim"], m[0]["n_shared"]) == (1.0, 2)


def test_align_entities_hot_token_cap(spark):
    from dug_spark.operators.canonicalize import align_entities

    # 'the' appears in every left name; with the cap it contributes no
    # candidate pairs, so only the real token overlap aligns
    left = spark.createDataFrame(
        [(i, f"the item{i}") for i in range(10)], "id long, name string"
    )
    right = spark.createDataFrame(
        [(100 + i, f"the item{i} v2") for i in range(10)],
        "id long, name string",
    )
    capped = align_entities(left, right, min_sim=0.3, max_token_df=5)
    got = {(r["left_id"], r["right_id"]) for r in capped.collect()}
    assert got == {(i, 100 + i) for i in range(10)}
    # 'the' (df=10 both sides) AND 'v2' (df=10 right) both exceed the
    # cap, so each pair reduces to the item<i> token alone: sim 1/1
    sims = {r["left_id"]: r["sim"] for r in capped.collect()}
    assert all(s == 1.0 for s in sims.values())
