"""Full-registry timing sweep at $SPARK_GRAFT_SF_DIR (default sf0.1):
every registered query once warm, once timed, sorted slowest-first.
Finds per-operator outliers the 14-query headline bench can't see.

Run: python experiments/registry_sweep.py [threshold_sec]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Streaming surfaces build their own readStream runs (seconds of fixed
# trigger latency each, not comparable); they are timed but flagged.
STREAMING = tuple(n for n in ALL_QUERIES if n.startswith("nd_stream"))


def main():
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    spark = get_session("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, (fn, _) in ALL_QUERIES.items():
        try:
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            times[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            print(f"ERROR {name}: {exc!r}"[:200])
    total = time.perf_counter() - t_all
    print(f"\n{len(times)} queries, sweep wall {total:.1f}s "
          f"(incl. warmups). Slowest first; * = streaming fixed latency:")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1]):
        if t < thresh:
            break
        star = "*" if name in STREAMING else " "
        print(f"{star} {name:28s} {t:7.2f}s")


if __name__ == "__main__":
    main()
