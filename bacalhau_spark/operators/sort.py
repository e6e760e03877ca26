"""Sort / limit / top-k.

Reference capability: CLI-side sort + first-N display
(`cmd/bacalhau/list.go:108-120,26-28`). Spark-first: orderBy().limit(k) is
planned as TakeOrderedAndProject — each partition keeps a k-row heap and only
k rows per partition reach the driver-side merge, so top-k over 100 TB never
materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price (Q25); orderkey tiebreak keeps it total-ordered
    and hash-stable."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


QUERIES = {
    "q25_topk": (
        q25_topk,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    ),
}
