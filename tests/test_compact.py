"""Small-file compaction planning (plans/compact.py)."""

from pyspark.sql import functions as F

from dug_spark.plans import compact

MB = 1024 * 1024


def test_pack_ffd_reference_cases():
    # classic FFD: 6,5,4,3,2 into bins of 10 -> {6,4}, {5,3,2}
    rows = compact.pack_ffd(
        [("a", 6), ("b", 5), ("c", 4), ("d", 3), ("e", 2)], 10
    )
    groups = {}
    for gid, f, sz, gbytes, n in rows:
        groups.setdefault(gid, set()).add(f)
    assert groups == {0: {"a", "c"}, 1: {"b", "d", "e"}}
    # oversized file owns its bin and is never topped up
    rows = compact.pack_ffd([("big", 15), ("s1", 4), ("s2", 4)], 10)
    by_file = {f: (gid, gbytes, n) for gid, f, sz, gbytes, n in rows}
    assert by_file["big"] == (0, 15, 1)
    assert by_file["s1"][0] == by_file["s2"][0] == 1
    # deterministic tie-break: equal sizes order by file name
    a = compact.pack_ffd([("x", 5), ("y", 5), ("z", 5)], 10)
    b = compact.pack_ffd([("z", 5), ("y", 5), ("x", 5)], 10)
    assert a == b


def _files_df(spark):
    rows = []
    for p in ("dt=1", "dt=2"):
        for i in range(40):
            rows.append((p, f"{p}/part-{i:03d}.parquet", (i * 7 + 3) * MB))
    return spark.createDataFrame(
        rows, "partition string, file string, size_bytes long"
    )


def test_compaction_plan_invariants(spark):
    df = _files_df(spark)
    plan = compact.compaction_plan(df, target_bytes=128 * MB)
    rows = plan.collect()
    # every input file appears exactly once
    assert sorted(r["file"] for r in rows) == sorted(
        r["file"] for r in df.collect()
    )
    for r in rows:
        # group accounting is consistent
        assert r["rewrite"] == (r["n_files_in_group"] > 1)
        assert r["group_bytes"] >= r["size_bytes"]
    # no multi-file group exceeds the target
    bad = (
        plan.where(F.col("rewrite") & (F.col("group_bytes") > 128 * MB))
        .count()
    )
    assert bad == 0
    # group_bytes/n_files agree with the actual group contents
    agg = (
        plan.groupBy("partition", "group_id")
        .agg(
            F.sum("size_bytes").alias("s"),
            F.count("*").alias("n"),
            F.first("group_bytes").alias("gb"),
            F.first("n_files_in_group").alias("gn"),
        )
        .where((F.col("s") != F.col("gb")) | (F.col("n") != F.col("gn")))
        .count()
    )
    assert agg == 0


def test_compaction_plan_matches_independent_mirror(spark):
    from dug_spark.functions import pyoracle as po

    df = _files_df(spark)
    got = sorted(tuple(r) for r in compact.compaction_plan(df, 128 * MB).collect())
    want = sorted(
        po.compaction_rows(
            [(r["partition"], r["file"], r["size_bytes"]) for r in df.collect()],
            128 * MB,
        )
    )
    assert got == want


def test_compaction_report(spark):
    df = _files_df(spark)
    plan = compact.compaction_plan(df, 128 * MB)
    rep = {r["partition"]: r for r in compact.compaction_report(plan).collect()}
    for p in ("dt=1", "dt=2"):
        r = rep[p]
        assert r["n_files"] == 40
        # compaction must strictly reduce the file count here (lots of
        # small files) and bookkeeping must be internally consistent
        assert r["n_files_after"] < r["n_files"]
        assert r["n_rewrite_groups"] <= r["n_files_rewritten"]


def test_compaction_single_shuffle(spark):
    plan = compact.compaction_plan(_files_df(spark), 128 * MB)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert s.count("Exchange") == 1  # exactly the partition-key shuffle
