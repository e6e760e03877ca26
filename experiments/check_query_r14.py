"""Spot oracle check for named queries (driver_sim's comparison, one or a
few queries instead of all 229 — fast iteration during optimization).

Run: python experiments/check_query_r14.py <query> [<query> ...] [--sf DIR]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
args = [a for a in sys.argv[1:]]
if "--sf" in args:
    i = args.index("--sf")
    SF_DIR = args[i + 1]
    del args[i:i + 2]

sys.path.insert(0, "/root/repo/.claude/skills/verify")
from driver_sim import TABLES, _hash  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from bacalhau_spark.registry import ALL_QUERIES

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("check-query").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    fails = []
    for name in args:
        fn, sql = ALL_QUERIES[name]
        got = fn(spark, SF_DIR).toPandas()
        if callable(sql):
            sql = sql(SF_DIR)
        if sql is None:
            print(f"{name}: no_oracle rows={len(got)}")
            continue
        want = con.execute(sql).fetchdf()
        ok = (len(got) == len(want)
              and sorted(got.columns) == sorted(want.columns)
              and _hash(got) == _hash(want))
        print(f"{name}: {'PASS' if ok else 'FAIL'} "
              f"rows={len(got)}/{len(want)}")
        if not ok:
            fails.append(name)
    if fails:
        sys.exit(f"FAILS: {fails}")


if __name__ == "__main__":
    main()
