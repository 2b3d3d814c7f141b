"""Driver-style correctness harness: runs every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compares row
count, sorted-column schema, and an order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from vlm_ocr_pipeline_spark.plans.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str, pd.DataFrame]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: repr(v))
        elif "float" in str(s.dtype):
            df[c] = s.map(lambda v: repr(float(v)))
        elif "datetime" in str(s.dtype):
            df[c] = s.astype(str)
        else:
            df[c] = s.map(lambda v: repr(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.md5(df.to_csv(index=False).encode()).hexdigest()
    return len(df), list(df.columns), h, df


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = bad = rows_only = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            got = fn(spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            bad += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            bad += 1
            continue
        ng, cg, hg, dg = canon(got)
        ne, ce, he, de = canon(exp)
        if ng != ne:
            print(f"FAIL  {name}: rows spark={ng} oracle={ne}")
            bad += 1
        elif cg != ce:
            print(f"FAIL  {name}: cols spark={cg} oracle={ce}")
            bad += 1
        elif hg != he:
            print(f"FAIL  {name}: value hash mismatch")
            diff = dg.compare(de) if dg.shape == de.shape else None
            if diff is not None and len(diff):
                print(diff.head(4))
            bad += 1
        else:
            print(f"OK    {name}: {ng} rows")
            ok += 1
    print(f"\n{ok} ok, {bad} fail, {rows_only} rows-only")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
