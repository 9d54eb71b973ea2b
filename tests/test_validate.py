"""SHACL-lite triple validation (operators/validate.py)."""

import pytest

from dug_spark.operators import validate


@pytest.fixture(scope="module")
def constraints(spark):
    rows = [
        # pred, domain_prefix, range_prefix, max_out
        ("HAS_CONCEPT", "doc", "MONDO", None),
        ("biolink:subclass_of", "MONDO", "MONDO", 1),
        ("free", None, None, None),
    ]
    return spark.createDataFrame(
        rows, "pred string, domain_prefix string, range_prefix string, max_out int"
    )


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _got(triples, constraints):
    return {
        tuple(r)
        for r in validate.validate_triples(triples, constraints).collect()
    }


def test_conforming_triples_emit_nothing(spark, constraints):
    t = _triples(
        spark,
        [
            ("doc:1", "HAS_CONCEPT", "MONDO:1"),
            ("MONDO:1", "biolink:subclass_of", "MONDO:2"),
            ("anything", "free", "goes"),
        ],
    )
    assert _got(t, constraints) == set()


def test_domain_range_unknown(spark, constraints):
    t = _triples(
        spark,
        [
            ("HP:9", "HAS_CONCEPT", "MONDO:1"),     # wrong subj prefix
            ("doc:1", "HAS_CONCEPT", "HP:9"),        # wrong obj prefix
            ("doc:1", "MENTIONS", "MONDO:1"),        # pred not declared
        ],
    )
    assert _got(t, constraints) == {
        ("HP:9", "HAS_CONCEPT", "MONDO:1", "domain"),
        ("doc:1", "HAS_CONCEPT", "HP:9", "range"),
        ("doc:1", "MENTIONS", "MONDO:1", "unknown_pred"),
    }


def test_bare_identifier_has_empty_prefix(spark):
    c = spark.createDataFrame(
        [("p", "", None, None)],
        "pred string, domain_prefix string, range_prefix string, max_out int",
    )
    t = _triples(spark, [("bare", "p", "x"), ("ns:qualified", "p", "x")])
    assert _got(t, c) == {("ns:qualified", "p", "x", "domain")}


def test_cardinality_marks_every_member(spark, constraints):
    t = _triples(
        spark,
        [
            ("MONDO:1", "biolink:subclass_of", "MONDO:2"),
            ("MONDO:1", "biolink:subclass_of", "MONDO:3"),
            ("MONDO:4", "biolink:subclass_of", "MONDO:5"),  # within cap
        ],
    )
    assert _got(t, constraints) == {
        ("MONDO:1", "biolink:subclass_of", "MONDO:2", "cardinality"),
        ("MONDO:1", "biolink:subclass_of", "MONDO:3", "cardinality"),
    }


def test_duplicate_triples_do_not_trip_cardinality(spark, constraints):
    # count DISTINCT objects: the same (s,p,o) stored twice is 1 object
    t = _triples(
        spark,
        [
            ("MONDO:1", "biolink:subclass_of", "MONDO:2"),
            ("MONDO:1", "biolink:subclass_of", "MONDO:2"),
        ],
    )
    assert _got(t, constraints) == set()


def test_one_triple_multiple_violations(spark, constraints):
    t = _triples(
        spark,
        [
            ("HP:1", "biolink:subclass_of", "doc:2"),
            ("HP:1", "biolink:subclass_of", "doc:3"),
        ],
    )
    got = _got(t, constraints)
    # each triple violates domain + range, and the pair violates max_out=1
    assert ("HP:1", "biolink:subclass_of", "doc:2", "domain") in got
    assert ("HP:1", "biolink:subclass_of", "doc:2", "range") in got
    assert ("HP:1", "biolink:subclass_of", "doc:2", "cardinality") in got
    assert len(got) == 6


def test_conformance_report(spark, constraints):
    t = _triples(
        spark,
        [
            ("doc:1", "HAS_CONCEPT", "MONDO:1"),
            ("doc:1", "HAS_CONCEPT", "HP:9"),
            ("doc:2", "MENTIONS", "MONDO:1"),
        ],
    )
    v = validate.validate_triples(t, constraints)
    rep = {
        r["pred"]: r for r in validate.conformance_report(v, t).collect()
    }
    assert rep["HAS_CONCEPT"]["n_triples"] == 2
    assert rep["HAS_CONCEPT"]["n_violating"] == 1
    assert rep["HAS_CONCEPT"]["n_range"] == 1
    assert rep["HAS_CONCEPT"]["n_domain"] == 0
    assert rep["MENTIONS"]["n_unknown_pred"] == 1
