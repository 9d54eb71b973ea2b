"""Leakage-safe corpus splitting (curate.leakage_safe_split)."""

import hashlib

from pyspark.sql import functions as F

from dug_spark.operators import curate


def _units_df(spark, n=2000):
    # ~200 hosts, 10 docs each — enough units for fraction checks
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("h"), (F.col("id") % 200).cast("string"), F.lit(".org")
        ).alias("host"),
    )


def test_split_is_host_disjoint_and_total(spark):
    out = curate.leakage_safe_split(_units_df(spark), unit_col="host")
    # every row labeled, labels drawn from the weight names
    assert out.where(F.col("split").isNull()).count() == 0
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # leakage guard: a host never straddles a split boundary
    mixed = (
        out.groupBy("host")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert mixed == 0


def test_split_matches_python_md5(spark):
    """The assignment is exactly substr(md5(salt||host),1,8) against the
    split_thresholds hex literals — recomputable anywhere."""
    weights = (("train", 0.8), ("val", 0.1), ("test", 0.1))
    ths = curate.split_thresholds(weights)
    out = curate.leakage_safe_split(
        _units_df(spark, 300), weights, unit_col="host", salt="s7"
    ).collect()

    def expect(host):
        h8 = hashlib.md5(("s7" + host).encode()).hexdigest()[:8]
        for name, hx in ths:
            if h8 < hx:
                return name
        return "test"

    assert all(r["split"] == expect(r["host"]) for r in out)


def test_split_fractions_near_weights(spark):
    out = curate.leakage_safe_split(_units_df(spark, 20000), unit_col="host")
    rep = {
        r["split"]: r
        for r in curate.split_report(out, unit_col="host").collect()
    }
    # 200 units -> binomial noise; just bound the realized unit shares
    units = {k: rep[k]["n_units"] if k in rep else 0 for k in ("train", "val", "test")}
    assert sum(units.values()) == 200
    assert units["train"] >= 150
    assert 0 < units["val"] < 50 and 0 < units["test"] < 50
    # report fractions sum to 1
    assert abs(sum(rep[k]["row_fraction"] for k in rep) - 1.0) < 1e-6


def test_split_stable_under_corpus_growth(spark):
    """Adding new docs/hosts never moves an existing unit's assignment —
    the property that keeps a frozen eval set valid as the corpus grows."""
    small = curate.leakage_safe_split(_units_df(spark, 500), unit_col="host")
    big = curate.leakage_safe_split(_units_df(spark, 2000), unit_col="host")
    s = {(r["doc_id"], r["split"]) for r in small.collect()}
    b = {(r["doc_id"], r["split"]) for r in big.collect()}
    assert s <= b


def test_split_salt_redeals_and_null_unit(spark):
    df = _units_df(spark, 400)
    a = curate.leakage_safe_split(df, unit_col="host", salt="a").collect()
    b = curate.leakage_safe_split(df, unit_col="host", salt="b").collect()
    assert {(r["doc_id"], r["split"]) for r in a} != {
        (r["doc_id"], r["split"]) for r in b
    }
    # NULL unit hashes as '' -> one definite, consistent split
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, host string"
    )
    rows = curate.leakage_safe_split(nulls, unit_col="host").collect()
    assert rows[0]["split"] == rows[1]["split"] is not None


def test_split_single_bucket_and_plan(spark):
    df = _units_df(spark, 50)
    only = curate.leakage_safe_split(df, (("all", 1.0),), unit_col="host")
    assert only.where(F.col("split") != "all").count() == 0
    # narrow map: no Exchange, no Python eval in the executed plan
    plan = (
        curate.leakage_safe_split(df, unit_col="host")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- host boilerplate stripping ----------------------------------------------


def _tpl_df(spark):
    rows = [
        # host A: NAV + Copyright on all 4 docs; PROMO on 1 of 4 (25% —
        # below the 0.5 threshold, must survive)
        (1, "a.org", "NAV A\nalpha body one\nCopyright A"),
        (2, "a.org", "NAV A\nPROMO A\nbeta body two\nCopyright A"),
        (3, "a.org", "NAV A\ngamma body three\nCopyright A"),
        (4, "a.org", "NAV A\ndelta body four\nCopyright A"),
        # host B: only 1 doc — min_docs=2 means nothing is boilerplate
        (5, "b.org", "NAV B\nsolo body\nCopyright B"),
        # host C: NULL text survives as one empty-text row
        (6, "c.org", None),
        (7, "c.org", "NAV C\nreal\nNAV C"),
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_host_boilerplate_lines_threshold(spark):
    from dug_spark.operators.curate import host_boilerplate_lines

    got = {
        (r["host"], r["line"]): (r["n_docs"], r["host_docs"], r["fraction"])
        for r in host_boilerplate_lines(_tpl_df(spark)).collect()
    }
    # host A: NAV + Copyright in 4/4; PROMO 1/4 excluded
    assert got[("a.org", "NAV A")] == (4, 4, 1.0)
    assert got[("a.org", "Copyright A")] == (4, 4, 1.0)
    assert ("a.org", "PROMO A") not in got
    # single-doc host: min_docs=2 blocks everything
    assert not any(h == "b.org" for h, _ in got)
    # duplicate occurrences inside ONE doc count that doc once: NAV C is
    # in 1 of 2 docs (0.5) but n_docs=1 < min_docs=2
    assert ("c.org", "NAV C") not in got


def test_strip_host_boilerplate_rows_and_order(spark):
    from dug_spark.operators.curate import strip_host_boilerplate

    rows = {
        r["id"]: r for r in strip_host_boilerplate(_tpl_df(spark)).collect()
    }
    assert len(rows) == 7  # one row per input doc, NULL text included
    assert rows[1]["clean_text"] == "alpha body one"
    # sub-threshold PROMO survives, in original position
    assert rows[2]["clean_text"] == "PROMO A\nbeta body two"
    assert (rows[2]["n_lines_kept"], rows[2]["n_lines_removed"]) == (2, 2)
    # single-doc host untouched
    assert rows[5]["clean_text"] == "NAV B\nsolo body\nCopyright B"
    assert rows[5]["n_lines_removed"] == 0
    # NULL text -> '' with zero removals
    assert (rows[6]["clean_text"], rows[6]["n_lines_removed"]) == ("", 0)


def test_strip_host_boilerplate_matches_mirror(spark):
    from dug_spark.functions import pyoracle as po
    from dug_spark.operators.curate import strip_host_boilerplate

    df = _tpl_df(spark)
    got = sorted(
        tuple(r) for r in strip_host_boilerplate(df).collect()
    )
    want = sorted(
        po.host_boilerplate_strip_rows(
            [(r["host"], r["doc_id"], r["text"]) for r in df.collect()]
        )
    )
    assert got == want
