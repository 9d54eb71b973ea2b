"""Pattern-based relation extraction (operators/relations.py): regex
builder invariants (pure Python) + end-to-end extraction goldens."""

import re

import pytest

from dug_spark import fixtures
from dug_spark.operators import relations


# ---------------------------------------------------------------------------
# relation_regex (pure)


def test_regex_longest_first_alternation():
    rx = relations.relation_regex(["scan", "scan operator"], ("causes",))
    # the longer phrase precedes its prefix in the alternation, so a
    # leftmost-first engine still matches the full phrase
    m = re.search(rx, "scan operator causes scan operator here")
    assert m and m.group(1) == "scan operator" and m.group(2) == "scan operator"


def test_regex_multiword_whitespace_runs():
    rx = relations.relation_regex(["hash join", "dup"], ("leads to",))
    m = re.search(rx, "a hash  join leads  to dup b")
    assert m and m.group(2) == "dup"
    assert re.sub(r"\s+", " ", m.group(1)) == "hash join"


def test_regex_word_boundaries():
    rx = relations.relation_regex(["scan", "dup"], ("causes",))
    assert re.search(rx, "rescan causes dup") is None
    assert re.search(rx, "scan causes dups") is None
    assert re.search(rx, "scan causes dup") is not None


def test_regex_non_overlapping_sequential():
    rx = relations.relation_regex(["a1", "b2", "c3"], ("causes",))
    ms = re.findall(rx, "a1 causes b2 causes c3")
    # the middle term is consumed by the first match in both engines
    assert ms == [("a1", "b2")]


# ---------------------------------------------------------------------------
# extract_relations (Spark)


@pytest.fixture(scope="module")
def dictionary(spark):
    return fixtures.vocab_dictionary(spark)


def _extract(spark, dictionary, rows):
    df = spark.createDataFrame(rows, "url string, text string")
    out = relations.extract_relations(df, dictionary)
    return {
        (r["id"], r["subj"], r["pred"], r["obj"]) for r in out.collect()
    }


def test_extract_golden(spark, dictionary):
    got = _extract(
        spark,
        dictionary,
        [
            ("u1", "the scan causes dup in every run"),
            ("u2", "hash join treats dup nicely"),
            ("u3", "vector interacts with stream"),
            ("u4", "nothing to see here"),
        ],
    )
    assert got == {
        ("u1", "OP:0005", "biolink:causes", "PATO:0001"),
        ("u2", "OP:0001", "biolink:treats", "PATO:0001"),
        ("u3", "EXPR:0001", "biolink:interacts_with", "OP:0006"),
    }


def test_extract_uppercase_and_whitespace(spark, dictionary):
    got = _extract(
        spark, dictionary, [("u1", "Scan   LEADS TO   Dup sometimes")]
    )
    assert got == {("u1", "OP:0005", "biolink:causes", "PATO:0001")}


def test_extract_unknown_surface_dropped(spark, dictionary):
    # "warp" matches no dictionary term → the regex never fires on it
    got = _extract(spark, dictionary, [("u1", "warp causes dup")])
    assert got == set()


def test_extract_distinct_per_doc(spark, dictionary):
    got = _extract(
        spark, dictionary, [("u1", "scan causes dup. scan causes dup.")]
    )
    assert len(got) == 1


def test_custom_pattern_table(spark, dictionary):
    df = spark.createDataFrame(
        [("u1", "window precedes filter")], "url string, text string"
    )
    out = relations.extract_relations(
        df, dictionary, patterns={"pipeline:precedes": ("precedes",)}
    )
    rows = out.collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [
        ("OP:0003", "pipeline:precedes", "OP:0004")
    ]
