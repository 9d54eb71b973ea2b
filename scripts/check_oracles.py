"""Local stand-in for the driver's correctness gate: run each queries()
entry under Spark AND its oracle_sql() under DuckDB at sf0.01, compare
row count, column names, and (column-name-sorted) values.

Usage:
    python scripts/check_oracles.py                # all queries
    python scripts/check_oracles.py ann_ivf_trained search_study ...
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 6)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, int):
        return v
    return v


def main():
    import duckdb

    import __spark_entry__ as entry
    from dug_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("check_oracles", cores=16, shuffle_partitions=16)
    qs = dict(entry.queries())
    # extra registry: fully-oracled queries beyond the driver's 50-row
    # CORRECTNESS window — same check, local-only
    extra = getattr(entry, "extra_queries", dict)()
    qs.update(extra)
    # resolve sf_dir-dependent pyoracle inputs the way the driver would:
    # a query ran first, then oracle_sql() is called
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    todo = names or list(qs)
    failures = []
    for name in todo:
        sdf = qs[name](spark, SF)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        oracles = dict(entry.oracle_sql())
        oracles.update(getattr(entry, "extra_oracle_sql", dict)())
        if name not in oracles:
            print(f"{name}: NO ORACLE ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols_raw = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name}: ORACLE SQL ERROR {e}")
            continue
        ocols = sorted(ocols_raw)
        nkey = lambda row: tuple((v is None, str(v)) for v in row)
        sset = sorted(
            (tuple(norm(r[c]) for c in scols) for r in srows), key=nkey
        )
        oset = sorted(
            (tuple(norm(v) for _, v in sorted(zip(ocols_raw, r))) for r in orows),
            key=nkey,
        )
        ok = len(srows) == len(orows) and scols == ocols and sset == oset
        status = "OK" if ok else "MISMATCH"
        if not ok:
            failures.append(name)
            print(f"{name}: {status} spark={len(srows)} oracle={len(orows)} "
                  f"cols {scols} vs {ocols}")
            for a, b in list(zip(sset, oset))[:5]:
                if a != b:
                    print(f"   spark {a}\n   orcle {b}")
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    print(f"\n{len(todo) - len(failures)}/{len(todo)} green; failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
