"""spark-submit job (jobs/run_pipeline.py): staged checkpointing + exact
resume.  Runs main() in-process against the shared session (getOrCreate
reuses it); the spark-submit --py-files path itself is exercised by
scripts/submit.sh (see README)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.run_pipeline import main  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_run_pipeline_job_and_resume(spark, tmp_path, capsys):
    out = str(tmp_path / "kg_out")
    main(["--input", SF, "--output", out, "--run-id", "r1"])
    first = capsys.readouterr().out
    assert "RESULT mentions=" in first
    n_triples = int(first.split("triples=")[1].split(" ")[0])
    assert n_triples > 0

    # all four stages committed with lineage rows
    for stage in ("mentions", "triples", "kg_answers", "concepts"):
        assert os.path.exists(os.path.join(out, stage, "_SUCCESS"))
    from dug_spark.plans.manifest import CheckpointManager

    manifest = CheckpointManager(out).manifest(spark)
    assert set(r["stage"] for r in manifest.collect()) == {
        "mentions", "triples", "kg_answers", "concepts"
    }
    # the mentions stage records real per-source-partition input rows
    src = [
        r
        for r in manifest.collect()
        if r["stage"] == "mentions" and r["scope"] == "source"
    ]
    assert src and all(r["input_rows"] > 0 for r in src)

    # exact resume: delete one stage's commit marker; rerun recomputes only
    # that stage (same outputs), leaving the others' manifest rows alone
    os.remove(os.path.join(out, "concepts", "_SUCCESS"))
    main(["--input", SF, "--output", out, "--run-id", "r2"])
    second = capsys.readouterr().out
    assert f"triples={n_triples}" in second
    m2 = CheckpointManager(out).manifest(spark)
    runs_by_stage = {
        r["stage"]: set(r["run_ids"])
        for r in m2.groupBy("stage")
        .agg(__import__("pyspark").sql.functions.collect_set("run_id").alias("run_ids"))
        .collect()
    }
    assert runs_by_stage["mentions"] == {"r1"}  # not recomputed
    assert "r2" in runs_by_stage["concepts"]  # recomputed
