#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle compare.

Usage: python3 dev/check.py <sfDir> <outDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Not part of the shipped library (the Scala code has no python deps);
this just tightens the local feedback loop before the driver's own
CORRECTNESS_r{N}.json run.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(duckdb.query(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')",
                connection=con).df())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failed.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failed.append(name)
            continue
        # The driver's hash is TYPED: DuckDB HUGEINT/DOUBLE vs Spark
        # BIGINT/DECIMAL fails even when values are exact (round-1
        # lesson) — so dtype mismatches are failures here too.
        if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            print(f"FAIL {name}: dtypes {list(map(str, got.dtypes))}"
                  f" != {list(map(str, exp.dtypes))}")
            failed.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
