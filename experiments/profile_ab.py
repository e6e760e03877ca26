"""A/B nd_profile variants at sf0.1 — where does the multi-distinct go."""
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
COLS = ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")


def bench(name, make, spark, n=5, warm=2):
    for _ in range(warm):
        make().write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        make().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    print(f"{name:30s} median={statistics.median(runs):.3f} "
          f"min={min(runs):.3f} max={max(runs):.3f}")


def agg_over(li):
    aggs = []
    for c in COLS:
        aggs += [F.count(F.lit(1)).alias(f"{c}__n"),
                 F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                 .alias(f"{c}__nulls"),
                 F.countDistinct(c).alias(f"{c}__distinct"),
                 F.min(F.col(c).cast("double")).alias(f"{c}__min"),
                 F.max(F.col(c).cast("double")).alias(f"{c}__max")]
    return li.agg(*aggs)


def union_form(spark, li):
    parts = []
    for c in COLS:
        parts.append(li.select(F.col(c).alias("v")).groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            F.min(F.col("v").cast("double")).alias("min_v"),
            F.max(F.col("v").cast("double")).alias("max_v"),
        ).select(F.lit(c).alias("col_name"), "n", "n_null", "n_distinct",
                 "min_v", "max_v"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_name")


def main():
    spark = get_session("profile-ab")
    spark.sparkContext.setLogLevel("ERROR")
    plain = lambda: table(spark, SF, "lineitem").select(*COLS)
    spread = lambda: spread_compute(spark, plain())

    bench("agg_plain_scan", lambda: agg_over(plain()), spark)
    bench("agg_spread", lambda: agg_over(spread()), spark)
    bench("union_5x_plain", lambda: union_form(spark, plain()), spark)
    bench("union_5x_spread", lambda: union_form(spark, spread()), spark)
    df = agg_over(spread())
    df.write.mode("overwrite").format("noop").save()
    print(df._jdf.queryExecution().executedPlan().toString()[:3000])
    spark.stop()


if __name__ == "__main__":
    main()
