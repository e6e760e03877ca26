"""Round-13 code-version A/B for the four bench rows that drifted >20%
at a LOWER ambient floor in BENCH_r12 vs BENCH_r11 (round-12 verdict,
What's wrong #2): nd_grouped_python +30%, nd_asof_join +25%,
nd_gopher_filter +24%, nd_kmeans +23%. The standing rule (adopted r11):
drifts that survive floor adjustment get a CODE-VERSION A/B — the same
harness run back-to-back against the old code (git worktree at the
last r11 commit 1af525d, module resolution from the worktree) — before
any number is banked, because the 1-row scheduler floor probes
job-launch latency, not CPU throughput, and under-captures
compute-heavy ambient contention.

Protocol per query: warm x2, median of 5 materializations; scheduler
floors bracket the whole batch. Run from the repo root for HEAD and
from the r11 worktree for the old code:
    python experiments/regression_ab_r13.py
    cd /tmp/r11ab && python experiments/regression_ab_r13.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ("nd_grouped_python", "nd_asof_join", "nd_gopher_filter",
           "nd_kmeans")


def main() -> None:
    from bench import materialize, scheduler_floor

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("regression-ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"code_root": ROOT, "sf_dir": SF_DIR, "queries": {}}
    # global warm pass (the bench.py first-position-bias rule)
    for name in QUERIES:
        fn, _ = ALL_QUERIES[name]
        for _ in range(2):
            materialize(fn(spark, SF_DIR))
    floor0 = scheduler_floor(spark)
    for name in QUERIES:
        fn, _ = ALL_QUERIES[name]
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        out["queries"][name] = {
            "median_s": round(statistics.median(runs), 3),
            "min_s": round(min(runs), 3),
            "max_s": round(max(runs), 3)}
    floor1 = scheduler_floor(spark)
    out["floor_start_s"] = floor0["median"]
    out["floor_end_s"] = floor1["median"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
