"""Aggregation operators (hash agg, distinct, approx, rollup).

The reference only counts output lines in its checkers
(`pkg/test/scenario/utils.go:152-154`); real aggregation is first-class here.
Spark's groupBy().agg() is automatically partial+final (map-side combine) —
the shuffle carries one row per (partition × group), not per input row, which
is what makes a 100 TB scan with 6 groups (q17) shuffle ~kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q17_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+aggregate (Q17) — the headline bench query."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q18_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (Q18). Spark expands this to a two-stage
    aggregate (partial distinct per partition, then merge)."""
    return (
        table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("exact_cnt"))
    )


def q18b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (no oracle — tolerance, not hash;
    the driver records a rows-only check). At 100 TB this is the right
    default: fixed-size sketch per partition, no distinct expansion."""
    return (
        table(spark, sf_dir, "orders")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_cnt"))
    )


def q19_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets rollup (Q19)."""
    return (
        table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("c"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("c"),
        )
    )


QUERIES = {
    "q17_hash_agg": (
        q17_hash_agg,
        "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus",
    ),
    "q18_count_distinct": (
        q18_count_distinct,
        "SELECT COUNT(DISTINCT o_custkey) AS exact_cnt FROM orders",
    ),
    "q18b_approx_distinct": (q18b_approx_distinct, None),
    "q19_rollup": (
        q19_rollup,
        "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c FROM orders "
        "GROUP BY ROLLUP(o_orderpriority, o_orderstatus) "
        "ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST, c",
    ),
}
