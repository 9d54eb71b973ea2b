"""Entity disambiguation by type coherence (operators/link.py
disambiguate_mentions): hand-checked anchor/coherence cases, the verdict
contract (one row per candidate, exactly one chosen per span), and the
prior/CURIE fallbacks."""

from dug_spark.operators import link


def _run(spark, cand_rows, type_rows):
    cands = spark.createDataFrame(
        cand_rows, "element_id string, search_text string, curie string, score double"
    )
    types = spark.createDataFrame(type_rows, "curie string, ctype string")
    return link.disambiguate_mentions(cands, types).collect()


def test_type_coherence_picks_contextual_sense(spark):
    # d1 talks about operators: "filter" (anchor, operator type) should
    # pull the ambiguous "window" to its operator sense despite the
    # higher prior on the widget sense
    rows = _run(
        spark,
        [
            ("d1", "filter", "OP:4", 0.9),
            ("d1", "window", "OP:3", 0.7),
            ("d1", "window", "GUI:1", 0.9),
        ],
        [("OP:4", "operator"), ("OP:3", "operator"), ("GUI:1", "widget")],
    )
    got = {(r["element_id"], r["search_text"], r["curie"]): r for r in rows}
    assert len(rows) == 3  # verdict contract: every candidate emitted
    assert got[("d1", "window", "OP:3")]["chosen"] is True
    assert got[("d1", "window", "OP:3")]["coherence"] == 1
    assert got[("d1", "window", "GUI:1")]["chosen"] is False
    assert got[("d1", "window", "GUI:1")]["coherence"] == 0
    assert got[("d1", "filter", "OP:4")]["chosen"] is True
    assert got[("d1", "filter", "OP:4")]["n_cands"] == 1


def test_prior_fallback_when_no_anchors(spark):
    rows = _run(
        spark,
        [("d1", "window", "OP:3", 0.7), ("d1", "window", "GUI:1", 0.9)],
        [("OP:3", "operator"), ("GUI:1", "widget")],
    )
    got = {r["curie"]: r for r in rows}
    assert got["GUI:1"]["chosen"] is True  # coherence tie 0-0 → prior
    assert got["OP:3"]["chosen"] is False


def test_curie_tiebreak_is_deterministic(spark):
    rows = _run(
        spark,
        [("d1", "x", "B:1", 0.5), ("d1", "x", "A:1", 0.5)],
        [],
    )
    got = {r["curie"]: r["chosen"] for r in rows}
    assert got == {"A:1": True, "B:1": False}


def test_anchor_excludes_itself_from_coherence(spark):
    # OP:3 is anchored in d1 via the unambiguous surface "windowing";
    # as a candidate for "window" its coherence counts OTHER operator
    # anchors only (here: none besides itself → 0), but it still beats
    # the widget sense on equal coherence via... prior here is equal,
    # so the CURIE tiebreak decides: GUI:1 < OP:3 would win — make the
    # self-anchor case explicit instead with a second anchor present.
    rows = _run(
        spark,
        [
            ("d1", "windowing", "OP:3", 0.9),
            ("d1", "filter", "OP:4", 0.9),
            ("d1", "window", "OP:3", 0.8),
            ("d1", "window", "GUI:1", 0.8),
        ],
        [("OP:3", "operator"), ("OP:4", "operator"), ("GUI:1", "widget")],
    )
    got = {(r["search_text"], r["curie"]): r for r in rows}
    # anchors: OP:3 (self) + OP:4 → coherence for OP:3 candidate = 1
    assert got[("window", "OP:3")]["coherence"] == 1
    assert got[("window", "OP:3")]["chosen"] is True


def test_exactly_one_chosen_per_span(spark):
    rows = _run(
        spark,
        [
            ("d1", "s", "A:1", 0.5), ("d1", "s", "B:1", 0.6),
            ("d2", "s", "A:1", 0.5), ("d2", "t", "C:1", 0.9),
        ],
        [("A:1", "x"), ("B:1", "x"), ("C:1", "x")],
    )
    from collections import Counter

    chosen = Counter(
        (r["element_id"], r["search_text"]) for r in rows if r["chosen"]
    )
    spans = {(r["element_id"], r["search_text"]) for r in rows}
    assert set(chosen) == spans and all(v == 1 for v in chosen.values())
