#!/usr/bin/env python3
"""Local mirror of the driver's correctness harness.

Runs DuckDB on each oracle SQL from oracle_sql.json against the test
parquet tables, loads the Spark-written result parquet, and compares
schema (sorted column names) + values (after sorting columns by name and
rows by all columns). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Dev tool only — the engine itself is pure Scala/Spark.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Timestamp unit (us vs ns) differs between DuckDB (us-precision
    # TIMESTAMP) and parquet-read results; values are what matter.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: missing spark result: {e}")
            n_bad += 1
            continue
        e, g = norm(exp), norm(got)
        if sorted(e.columns) != sorted(g.columns):
            print(f"FAIL {name}: columns exp={sorted(e.columns)} got={sorted(g.columns)}")
            n_bad += 1
            continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows exp={len(e)} got={len(g)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(e, g, check_dtype=True,
                                          check_exact=True)
            print(f"ok   {name} ({len(e)} rows)")
            n_ok += 1
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch\n{str(ex)[:800]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
