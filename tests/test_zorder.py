"""Z-order layout clustering (plans/zorder.py)."""

from pyspark.sql import functions as F

from dug_spark.functions import pyoracle
from dug_spark.plans import zorder

BITS = 6
NUM_FILES = 16


def _rows(n=512):
    preds = ["links_to", "mentions", "same_as", "subclass_of"]
    return [(i, f"doc:{i % 41}", preds[i % 4]) for i in range(n)]


def _df(spark, n=512):
    return spark.createDataFrame(_rows(n), "row_id long, subj string, pred string")


def test_keys_match_pure_python_mirror(spark):
    got = {
        (r.row_id, r.subj_bucket, r.pred_bucket, r.z)
        for r in zorder.zorder_keys(_df(spark), ["subj", "pred"], bits=BITS)
        .select("row_id", "subj_bucket", "pred_bucket", "z")
        .collect()
    }
    want = set(pyoracle.zorder_rows(_rows(), BITS))
    assert got == want


def test_interleave_roundtrip():
    # deinterleaving the Morton code recovers every bucket exactly
    for a in (0, 1, 37, 63):
        for b in (0, 5, 42, 63):
            z = pyoracle.zorder_interleave([a, b], BITS)
            ra = sum(((z >> (2 * i)) & 1) << i for i in range(BITS))
            rb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(BITS))
            assert (ra, rb) == (a, b)


def test_null_and_salt(spark):
    df = spark.createDataFrame([(1, None)], "row_id long, subj string")
    got = zorder.zorder_keys(df, ["subj"], bits=BITS).collect()[0]
    assert got.subj_bucket == pyoracle.zorder_bucket(None, BITS)
    salted = zorder.zorder_keys(df, ["subj"], bits=BITS, salt="s1").collect()[0]
    assert salted.subj_bucket == pyoracle.zorder_bucket(None, BITS, salt="s1")


def test_cluster_preserves_rows_and_sorts(spark):
    clustered = zorder.cluster_by_zorder(
        _df(spark), ["subj", "pred"], bits=BITS, num_files=NUM_FILES
    )
    assert clustered.rdd.getNumPartitions() <= NUM_FILES
    # no rows lost or duplicated
    assert sorted(r.row_id for r in clustered.collect()) == list(range(512))
    # z nondecreasing within every would-be file
    for part in clustered.select("z").rdd.glom().collect():
        zs = [r.z for r in part]
        assert zs == sorted(zs)


def test_zorder_prunes_both_dimensions(spark):
    df = _df(spark, 2048)
    z_env = zorder.layout_envelopes(
        zorder.cluster_by_zorder(df, ["subj", "pred"], bits=BITS, num_files=NUM_FILES),
        ["subj_bucket", "pred_bucket"],
    ).cache()
    # the linear baseline: same bucket columns, laid out by subj only
    lin = (
        zorder.zorder_keys(df, ["subj", "pred"], bits=BITS)
        .repartitionByRange(NUM_FILES, "subj_bucket")
        .sortWithinPartitions("subj_bucket")
    )
    lin_env = zorder.layout_envelopes(
        lin, ["subj_bucket", "pred_bucket"]
    ).cache()
    n_z = z_env.count()
    n_lin = lin_env.count()

    def scanned(env, col, value):
        return zorder.files_scanned(env, {col: value}).count()

    subj_vals = sorted(
        {pyoracle.zorder_bucket(f"doc:{i}", BITS) for i in range(41)}
    )
    pred_vals = sorted(
        {
            pyoracle.zorder_bucket(p, BITS)
            for p in ("links_to", "mentions", "same_as", "subclass_of")
        }
    )
    # pred-equality: linear-on-subj layout cannot prune (every file spans
    # the full pred range); z-order must beat it
    lin_pred = sum(scanned(lin_env, "pred_bucket", v) for v in pred_vals)
    z_pred = sum(scanned(z_env, "pred_bucket", v) for v in pred_vals)
    assert lin_pred == len(pred_vals) * n_lin  # no pruning at all
    assert z_pred < lin_pred
    # subj-equality: both layouts prune; z-order still skips most files
    z_subj = sum(scanned(z_env, "subj_bucket", v) for v in subj_vals)
    assert z_subj < len(subj_vals) * n_z


def test_zorder_keys_is_pure_projection(spark):
    plan = (
        zorder.zorder_keys(_df(spark), ["subj", "pred"], bits=BITS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # zero shuffle until the layout step
