"""A/B q15 (5-way join) shapes at sf0.1: chained broadcast probes on the
fact vs pre-folded dim chain (one probe on the fact)."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bench(name, make, spark, n=7, warm=2):
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
    spark = get_session("q15-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def tabs():
        return (
            table(spark, SF, "lineitem").select("l_orderkey",
                                                "l_extendedprice",
                                                "l_discount"),
            table(spark, SF, "orders").select("o_orderkey", "o_custkey"),
            table(spark, SF, "customer").select("c_custkey", "c_nationkey"),
            table(spark, SF, "nation").select("n_nationkey", "n_regionkey"),
            table(spark, SF, "region").select("r_regionkey", "r_name"),
        )

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def current():
        li, o, c, n, r = tabs()
        return (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
                .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                .groupBy("r_name").agg(F.round(F.sum(rev), 2).alias("rev"))
                .orderBy("r_name"))

    def folded():
        li, o, c, n, r = tabs()
        dim = (c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
               .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
               .select("c_custkey", "r_name"))
        o2 = (o.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "r_name"))
        return (li.join(F.broadcast(o2), F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("r_name").agg(F.round(F.sum(rev), 2).alias("rev"))
                .orderBy("r_name"))

    bench("current_chained", current, spark)
    bench("folded_dim_chain", folded, spark)
    bench("current_chained2", current, spark)
    bench("folded_dim_chain2", folded, spark)

    spark.stop()


if __name__ == "__main__":
    main()
