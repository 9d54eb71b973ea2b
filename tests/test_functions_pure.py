"""Pure-Python function tests (no Spark session needed)."""

from dug_spark.functions.biolink import biolink_snake_case, prettify_biolink_type
from dug_spark.functions.text import ngram_jaccard, preprocess_text, sliding_window


def test_biolink_snake_case():
    # utils.py:53-72 semantics
    assert biolink_snake_case("SmallMolecule") == "small_molecule"
    # quirk preserved from utils.py:53-72: the hump rule needs a lowercase
    # predecessor, so the capital after '_' stays capital
    assert biolink_snake_case("biolink:Disease") == "biolink_Disease"
    assert biolink_snake_case("phenotypic feature") == "phenotypic_feature"


def test_prettify_biolink_type():
    # annotators/_base.py:174-179 fallback
    assert prettify_biolink_type("biolink:SmallMolecule") == "small molecule"
    assert prettify_biolink_type("biolink:Disease") == "disease"
    assert prettify_biolink_type("biolink:AnatomicalEntity") == "anatomical entity"


def test_preprocess_ordering():
    # dict-order replacement: "_"→" " runs after "bmi" replacement
    assert preprocess_text("bmi_at_rest") == "body mass index at rest"


def test_sliding_window_reference_shape():
    # the reference generator (monarch_annotator.py:85-111) on its own
    # docstring example: the rewind/termination quirk yields exactly this
    # (the docstring CLAIMS "ddd eeee" appears; the code does not do that —
    # SURVEY §7: "match observed behavior, not intent")
    text = "aaaa bbb ccc ddd eeee"
    chunks = sliding_window(text, max_characters=9, padding_words=1)
    assert chunks == ["aaaa bbb ", "bbb ccc ", "bbb ccc"]


def test_ngram_jaccard_symmetry():
    assert ngram_jaccard("abc", "bcd") == ngram_jaccard("bcd", "abc")
    assert ngram_jaccard("", "") == 1.0


def test_sentence_chunks_matches_mirror(spark):
    from pyspark.sql import functions as F

    from dug_spark.functions import pyoracle as po
    from dug_spark.functions.text import sentence_chunks_col

    texts = [
        "One two. Three four! Five six? Seven.",
        "A" * 60 + ". Bb. Cc.",
        "No enders here just words",
        "",
        None,
        "Tail space.   Next!  ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", sentence_chunks_col(F.col("text"), max_chars=20).alias("c")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == po.sentence_chunks(t, 20), (i, t)
    # boundary semantics: chunks join back to the sentence stream
    assert got[0] == ["One two. Three four!", "Five six? Seven."]
    assert got[1][0].startswith("A" * 60)  # over-long sentence stands alone
