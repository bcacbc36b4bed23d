#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out [name...]

For each query result parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns
by name and rows by all columns, and value-compares. Dev-only tool (the
real gate is driver-side); python/duckdb are NOT dependencies of the
library itself.
"""
import json
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet"):
            name = f[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{f}')"
            )
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_df = canon(
            con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        )
        oracle_df = canon(con.execute(sql).fetchdf())
        ok_rows = len(spark_df) == len(oracle_df)
        ok_cols = list(spark_df.columns) == list(oracle_df.columns)
        ok_vals = ok_rows and ok_cols and spark_df.equals(oracle_df)
        if ok_vals:
            print(f"EXACT  {name} ({len(spark_df)} rows)")
            continue
        # tolerate float representation noise before declaring failure
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    spark_df, oracle_df, check_exact=False, rtol=1e-9, atol=1e-12
                )
                print(f"CLOSE  {name} ({len(spark_df)} rows, float-tol match)")
                continue
            except AssertionError as e:
                detail = str(e).splitlines()[0]
        else:
            detail = (
                f"rows {len(spark_df)} vs {len(oracle_df)}, "
                f"cols {list(spark_df.columns)} vs {list(oracle_df.columns)}"
            )
        failures += 1
        print(f"FAIL   {name}: {detail}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
