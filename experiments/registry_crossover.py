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

CAVEAT for multipliers beyond ~10 with the PLAIN fixture: build_scaled
replicates documents with shifted doc_ids but IDENTICAL text, so every
replica is an exact near-dup of its original and the LSH candidate-pair
OUTPUT grows quadratically with the multiplier (m copies per bucket →
m(m-1)/2 pairs). At 10× that inflation applies equally to both engines
and the scan/aggregation path still dominates; at 30× the pair explosion
is the workload (measured: Spark 10.8 s vs DuckDB 8.3 s — DuckDB's radix
agg absorbs the quadratic output better, Spark pays the bigger distinct
shuffle). A real 30× corpus would not be 97% duplicates.

`--perturb` (round 6) fixes that: build_scaled_perturbed suffixes every
word of replica i with 'r{i}' — deterministic, no RNG — so replicas are
NOT near-dups of each other, candidate pairs grow linearly, and a >10×
multiplier measures CORPUS scaling instead of pair explosion. Recorded
run: experiments/registry_crossover_r6_30x.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import (SF_DIR, build_scaled,
                                         build_scaled_perturbed)

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
    ap.add_argument("--perturb", action="store_true",
                    help="per-replica deterministic text perturbation: "
                         "replicas are not near-dups, candidate growth "
                         "stays linear (the honest >10x fixture)")
    ap.add_argument("--queries", default=",".join(QUERIES),
                    help="comma list of registered documents-table "
                         "queries to measure (round 6: the new operator "
                         "sweep reuses this harness)")
    args = ap.parse_args()
    query_names = tuple(q for q in args.queries.split(",") if q)

    import duckdb

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    tag = f"sf0.1x{args.mult}" + ("p" if args.perturb else "")
    build = build_scaled_perturbed if args.perturb else build_scaled
    for label, mult in (("sf0.1", 1), (tag, args.mult)):
        d = SF_DIR if mult == 1 else build(args.scratch, args.mult)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        for name in query_names:
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
