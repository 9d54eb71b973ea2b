"""Local mirror of the driver's DuckDB oracle gate: every queries() entry
with an oracle_sql() is executed on Spark AND DuckDB at sf0.01 and compared
row-for-row (column names, row count, exact values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def test_every_query_has_oracle_or_is_documented():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    odf = _normalize(duck.execute(ORACLES[name]).df())
    assert list(sdf.columns) == list(odf.columns), (
        f"{name}: columns {list(sdf.columns)} vs {list(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    for c in sdf.columns:
        a, b = sdf[c].to_numpy(), odf[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            diff = np.nanmax(np.abs(a - b)) if len(a) else 0.0
            assert diff == 0.0, f"{name}.{c}: max float diff {diff}"
        else:
            eq = pd.Series(a).fillna("\0") == pd.Series(b).fillna("\0")
            assert eq.all(), (
                f"{name}.{c}: first mismatch at row {int(np.argmin(eq.to_numpy()))}: "
                f"{a[~eq.to_numpy()][:3]} vs {b[~eq.to_numpy()][:3]}"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) >= {"subj", "pred", "obj"}


def test_pyoracle_failure_degrades_to_rows_only(monkeypatch):
    """An unreadable pyoracle input dir must degrade ONLY the recompute
    VALUES entries to rows-only — never raise out of oracle_sql() and take
    down the 44 SQL oracles with it."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF", "/nonexistent/sfdir")
    entry_mod._pyoracle_values_cache.pop("/nonexistent/sfdir", None)
    sqls = entry_mod.oracle_sql()
    assert "dedup_minhash" not in sqls and "ann_ivf_trained" not in sqls
    assert "kg_mentions" in sqls and "dedup_exact" in sqls


def test_values_or_empty_is_typed(duck):
    """Empty pyoracle results must produce TYPED null columns so DuckDB's
    schema still matches Spark's (bigint/double), not typeless NULLs."""
    sql = entry_mod._values_or_empty(
        [], "id_a, id_b, jaccard", "BIGINT, BIGINT, DOUBLE"
    )
    cur = duck.execute(sql)
    assert cur.fetchall() == []
    types = [d[1] for d in cur.description]
    assert all(t == "NUMBER" for t in types)
