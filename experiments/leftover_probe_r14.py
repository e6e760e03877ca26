"""Round-14 leftover probe: warm, repeated noop-sink timings for the
rows the round doc listed as "Not yet optimized" (plus the two TPC-H
shapes flagged as unexamined-in-depth). Medians of N reps inside ONE
session, run on an otherwise idle box — the ranking input for the last
optimization slice of the round.

Run: python experiments/leftover_probe_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = [
    "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier",
    "nd_ngram_jaccard",
    "nd_weighted_jaccard",
    "nd_containment",
    "nd_pq_retrain",
    "nd_pq_incremental",
    "nd_stream_stream_join",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session("leftover-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        fn(spark, SF).write.mode("overwrite").format("noop").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} median {statistics.median(ts):6.3f}s  "
              f"min {min(ts):6.3f}  max {max(ts):6.3f}", flush=True)


if __name__ == "__main__":
    main()
