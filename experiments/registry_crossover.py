"""Registry-query crossover: the two headline curation/dedup queries run
EXACTLY as registered (Spark fn vs the registry's own DuckDB oracle SQL)
against 10× data with production row-group sizing.

scale_crossover.py measures simplified SHAPES; this runs the real
nd_minhash_lsh and nd_gopher_filter — orderBy, hot-bucket guard, full
flag set and all — so the 2×-bar conversation has a like-for-like data
point at the next scale step. Reuses scale_crossover.build_scaled (10×
documents with shifted doc_ids, ~64k-row groups).

Run: python experiments/registry_crossover.py [--mult 10]
Prints one JSON line per (query, scale).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import SF_DIR, build_scaled

QUERIES = ("nd_gopher_filter", "nd_minhash_lsh")


def median_runs(fn, n=3):
    fn()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        d = SF_DIR if mult == 1 else build_scaled(args.scratch, args.mult)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        for name in QUERIES:
            fn, sql = ALL_QUERIES[name]
            s = median_runs(lambda: fn(spark, d)
                            .write.mode("overwrite").format("noop").save())
            dd = median_runs(lambda: con.execute(sql).fetchall())
            print(json.dumps({"query": name, "scale": label,
                              "spark_s": s, "duckdb_s": dd,
                              "ratio": round(s / dd, 2)}))
        con.close()


if __name__ == "__main__":
    main()
