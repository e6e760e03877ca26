"""Round-5 floor A/B for tpch_q6_forecast: is the 3.6x-vs-DuckDB gap
compressible, or a fixed cost? (Round-4 verdict item 4.)

Decomposition at sf0.1 (medians of the committed run of THIS script,
local[32]; min in parens):

    trivial floor:  spark.range(1).agg(sum) -> noop    0.108 s  (0.090)
    q6, PREBUILT DataFrame re-executed                 0.157 s  (0.135)
    q6, rebuilt per run (the bench protocol)           0.185 s  (0.163)
    q6 DataFrame construction alone (no action)        0.052 s
    DuckDB, full q6 incl. parse+plan (BASELINE.md)     0.040 s

    (A second session on an idler host measured 0.110/0.124/0.204 —
    the prebuilt-vs-floor delta is 15-50 ms depending on load; the
    floor-vs-DuckDB relation below is load-insensitive.)

Reading:
1. Executing q6's PHYSICAL WORK costs 15-50 ms over the trivial floor:
   the scan+filter+two-level-sum on ~600k rows is near-free; the plan
   (pushed filters, 4-column ReadSchema, single exchange of one
   partial-sum row) has nothing left to remove.
2. The floor itself — ONE action on a ONE-ROW dataframe through the
   DAGScheduler + noop sink — is 0.108 s, i.e. 2.7x DuckDB's ENTIRE
   q6. The <=2x bar is therefore unreachable for this query at sf0.1 on
   local-mode Spark REGARDLESS of plan quality: the constant is Spark's
   job-launch machinery (job submit, stage planning, task serialization,
   32-core task launch round), not the query.
3. Plan REUSE (prepared-statement style) would cut the bench number by
   the per-run Py4J construction + analysis cost (~0.03-0.08 s) — but
   the bench intentionally rebuilds per run because the
   DuckDB oracle timing also re-parses per run; reusing on one side only
   would compare a prepared plan against a cold parse. Rejected.
4. The gap closes with DATA, not tuning: scale_crossover.py shows the
   per-query constant amortizing at 10x data (production row-group
   layout), where Spark's parallel scan dominates and the curation-shape
   queries cross below DuckDB. q6 is graded "fixed-cost floor" —
   documented here with the committed numbers, as the verdict requested.

Run: python experiments/q6_floor.py [sf_dir]
Prints one JSON line with the re-measured numbers on this host.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.operators.tpch import tpch_q6_forecast
from bacalhau_spark.session import get_session


def med(f, n=9):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 4), round(min(xs), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    trivial = spark.range(1).agg(F.sum("id").alias("s"))
    for _ in range(3):
        noop(tpch_q6_forecast(spark, sf_dir))
        noop(trivial)
    out = {}
    out["trivial_floor"], out["trivial_floor_min"] = med(
        lambda: noop(trivial))
    prebuilt = tpch_q6_forecast(spark, sf_dir)
    out["q6_prebuilt"], out["q6_prebuilt_min"] = med(lambda: noop(prebuilt))
    out["q6_rebuilt"], out["q6_rebuilt_min"] = med(
        lambda: noop(tpch_q6_forecast(spark, sf_dir)))
    t0 = time.perf_counter()
    for _ in range(10):
        tpch_q6_forecast(spark, sf_dir)
    out["q6_build_only"] = round((time.perf_counter() - t0) / 10, 4)
    print(json.dumps({"sf_dir": sf_dir, "seconds": out}))


if __name__ == "__main__":
    main()
