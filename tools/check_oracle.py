#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the Spark result parquet dumped
by graft.Verify. Compares schema (column names), row count, and values
(column-name-sorted, row-sorted hash like the driver)."""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s_cols = sorted(spark_df.columns)
        d_cols = sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            failures += 1
            continue
        s = ["|".join(map(str, r)) for r in spark_df[s_cols].itertuples(index=False)]
        d = ["|".join(map(str, r)) for r in duck_df[d_cols].itertuples(index=False)]
        if sorted(s) != sorted(d):
            sset, dset = set(s), set(d)
            print(f"FAIL {name}: value mismatch; spark-only={list(sset - dset)[:3]} "
                  f"duck-only={list(dset - sset)[:3]}")
            failures += 1
            continue
        print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
