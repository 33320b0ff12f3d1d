"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given SF, compares row count, column names and an
order-insensitive value hash (floats rounded), prints a PASS/FAIL
table.  Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from goka_spark.queries.base import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
        # normalize timestamp flavors
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    # data-derived oracles (IVF centroid literals) must be built from
    # THIS run's sf dir; the driver's gate uses the sf0.01 default
    import os
    os.environ["GOKA_SPARK_ORACLE_SF"] = sf

    import __spark_entry__ as entrymod
    from goka_spark.session import get_session

    spark = get_session("verify_local")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    # --front[=N]: verify exactly the first N registry keys — the
    # slice the driver's 50-slot correctness gate will record.
    # Scan ALL args (set iteration order is hash-randomized).
    front = [a for a in only if a.startswith("--front")]
    if front:
        arg = front[0]
        n = int(arg.split("=")[1]) if "=" in arg else 50
        only = (only - set(front)) | set(list(qs)[:n])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {el:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} != {list(o.columns)}")
            failures += 1
        elif len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} != {len(o)}")
            failures += 1
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            print(pd.concat([s[bad].head(3), o[bad].head(3)]))
            failures += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {el:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
