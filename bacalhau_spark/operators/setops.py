"""Set operations and subqueries.

Absent in the reference (SURVEY.md §2.6); Catalyst built-ins here. INTERSECT
plans as a shuffle semi-join on the full row; the scalar subquery in q27 is a
broadcast of a 1-row aggregate — no driver-side collect in the plan the user
writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer and supplier nation keys (Q26)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


def q27_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the mean price (Q27). The mean is a 1-row DataFrame
    cross-broadcast into the filter — fully distributed, no .collect()."""
    orders = table(spark, sf_dir, "orders")
    mean = orders.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        orders.crossJoin(F.broadcast(mean))
        .where(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


QUERIES = {
    "q26_intersect": (
        q26_intersect,
        "SELECT c_nationkey AS k FROM customer INTERSECT "
        "SELECT s_nationkey AS k FROM supplier ORDER BY k",
    ),
    "q27_scalar_subquery": (
        q27_scalar_subquery,
        "SELECT o_orderkey FROM orders WHERE o_totalprice > "
        "(SELECT AVG(o_totalprice) FROM orders) ORDER BY o_orderkey",
    ),
}
