"""Calm-box repeated-median probe for the rows the calm sweep flagged."""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = [
    "nd_pagerank",
    "q04_math_funcs",
    "nd_percentiles",
    "nd_bigram_surprisal",
    "nd_neardup_decontam",
    "nd_ngram_overlap",
    "nd_bpe_count",
    "nd_ks_drift",
    "nd_curation_pipeline",
    "nd_word_rarity",
    "nd_chunk_dedup",
    "tpch_q16_supplier_cnt",
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session("calm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        fn(spark, SF).write.mode("overwrite").format("noop").save()
    series: dict[str, list[float]] = {n: [] for n in ROWS}
    for _ in range(reps):
        for name in ROWS:
            fn, _ = ALL_QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            series[name].append(time.perf_counter() - t0)
    for name in ROWS:
        s = sorted(series[name])
        print(f"{name:28s} med {statistics.median(s):6.3f}  "
              f"min {s[0]:6.3f}  max {s[-1]:6.3f}")


if __name__ == "__main__":
    main()
