"""Round-11 matched-floor kmeans check (round-10 verdict, What's wrong
#5): nd_kmeans drifted +21% closing-over-closing in round 10 while
`similarity.py` changed (PQ additions), with floor evidence suggesting
ambient load. This measures kmeans WITH its bracketing scheduler floors
in one session so the number is load-self-identifying; compare
floor-adjusted (t - floor) against the r9/r10 closing pair
(0.672 @ floor 0.0926 / 0.813 @ floor 0.0965). Protocol: bench.py's —
warm-up x2 then median of 5, noop sink, floor probe before and after.
Run: python experiments/kmeans_floor_ab_r11.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import materialize, scheduler_floor

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("kmeans-floor-ab-r11")
    spark.sparkContext.setLogLevel("ERROR")
    fn, _ = ALL_QUERIES["nd_kmeans"]
    for _ in range(3):
        materialize(fn(spark, SF_DIR))
    floor0 = scheduler_floor(spark)
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        runs.append(time.perf_counter() - t0)
    floor1 = scheduler_floor(spark)
    med = round(statistics.median(runs), 3)
    floor = (floor0["median"] + floor1["median"]) / 2
    print(json.dumps({
        "sf_dir": SF_DIR,
        "kmeans_median_s": med,
        "kmeans_min_s": round(min(runs), 3),
        "kmeans_max_s": round(max(runs), 3),
        "floor_start_s": floor0["median"], "floor_end_s": floor1["median"],
        "floor_adjusted_s": round(med - floor, 3),
        "r9_closing": {"kmeans_s": 0.672, "floor_s": 0.0926,
                       "floor_adjusted_s": round(0.672 - 0.0926, 3)},
        "r10_closing": {"kmeans_s": 0.813, "floor_s": 0.0965,
                        "floor_adjusted_s": round(0.813 - 0.0965, 3)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
