"""Measure the round-4 curation operators at sf0.1: Spark (noop-sink
materialization, warmed, median of 5) vs DuckDB running the registry's own
oracle SQL on the same parquet files (fetchall, median of 5).

Feeds the BASELINE.md §3 table. Run: python experiments/curation_bench.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = ("nd_pii_redact", "nd_gopher_filter", "nd_repetition", "nd_seq_pack",
         "nd_ngram_overlap", "nd_domain_mix", "nd_bpe_pair_count",
         "nd_profile",
         # round-5 additions
         "nd_chunk_dedup", "nd_word_rarity")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main():
    spark = get_session("curation-bench")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    # global warmup (see bench.py)
    for name in NAMES:
        fn, _ = ALL_QUERIES[name]
        fn(spark, SF).write.mode("overwrite").format("noop").save()

    print(f"{'query':22s} {'spark':>7s} {'duckdb':>7s} {'ratio':>6s}")
    for name in NAMES:
        fn, sql = ALL_QUERIES[name]
        for _ in range(2):
            fn(spark, SF).write.mode("overwrite").format("noop").save()
        s_runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            s_runs.append(time.perf_counter() - t0)
        d_runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            d_runs.append(time.perf_counter() - t0)
        s, d = statistics.median(s_runs), statistics.median(d_runs)
        print(f"{name:22s} {s:7.3f} {d:7.3f} {s / d:6.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
