"""A/B q17 (scan+hash agg over single-row-group lineitem) variants at sf0.1.

Findings feed BASELINE.md / session defaults. Run: python experiments/q17_ab.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import table, spread_compute
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(name, make, spark, n=5, warm=2):
    for _ in range(warm):
        make().write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        make().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    print(f"{name:28s} median={statistics.median(runs):.3f} "
          f"min={min(runs):.3f} max={max(runs):.3f}")


def main():
    spark = get_session("q17-ab")
    spark.sparkContext.setLogLevel("ERROR")
    li = lambda: table(spark, SF, "lineitem")

    def agg(df):
        return (df.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sum_qty"),
                     F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                     F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                     F.count("*").alias("n"))
                .orderBy("l_returnflag", "l_linestatus"))

    bench("scan_only_count", lambda: li().select("l_quantity"), spark)
    bench("current", lambda: agg(li()), spark)
    bench("spread_then_agg", lambda: agg(spread_compute(
        spark, li().select("l_returnflag", "l_linestatus", "l_quantity",
                           "l_extendedprice", "l_discount"))), spark)

    spark.stop()


if __name__ == "__main__":
    main()
