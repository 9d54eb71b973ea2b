"""Mojibake repair (textstats.fix_mojibake / _repair_mojibake_text):
pure-rule goldens + Spark parity with the pyoracle recompute."""

from dug_spark.functions import pyoracle as po
from dug_spark.operators.textstats import _repair_mojibake_text, fix_mojibake


def test_single_round_repair():
    good = "café naïve résumé"
    bad = good.encode("utf-8").decode("latin-1")
    assert _repair_mojibake_text(bad) == (good, 1)


def test_double_round_repair():
    good = "señor über — em"
    bad2 = (
        good.encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    )
    assert _repair_mojibake_text(bad2) == (good, 2)


def test_legitimate_accents_untouched():
    for s in ("café", "plain ascii", "", "naïveté déjà vu", "日本語テキスト"):
        assert _repair_mojibake_text(s) == (s, 0)


def test_cp1252_smart_quote_repair():
    good = "it’s fine"
    bad = good.encode("utf-8").decode("cp1252")  # 'itâ€™s fine'
    assert _repair_mojibake_text(bad) == (good, 1)


def test_spark_parity_with_pyoracle(spark):
    suffix = po.MOJI_SUFFIX
    m1 = suffix.encode("utf-8").decode("latin-1")
    rows = [
        (0, "clean doc"),
        (13, "corrupted doc" + m1),
        (26, "double" + m1.encode("utf-8").decode("latin-1")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["mojibake_rounds"], len(r["fixed_text"]))
        for r in fix_mojibake(df).collect()
    }
    assert got[0] == (0, len("clean doc"))
    assert got[13] == (1, len("corrupted doc" + suffix))
    assert got[26] == (2, len("double" + suffix))
