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


def q27b_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelates to a left-semi join): orders from
    high-balance customers. The subquery side is deduped then broadcast —
    the plan Catalyst picks for a bounded IN-list source."""
    orders = table(spark, sf_dir, "orders")
    rich = (table(spark, sf_dir, "customer")
            .where(F.col("c_acctbal") > 9000)
            .select("c_custkey"))
    return (
        orders.join(rich, orders.o_custkey == rich.c_custkey, "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


def q26b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: order keys with no lineitem, as a set difference (the set-op
    spelling of q14's anti join — same shuffle-semi physical shape).
    `subtract` is EXCEPT DISTINCT — a key on both sides is dropped whatever
    its left multiplicity (exceptAll().distinct() would wrongly keep keys
    whose left count exceeds their right count)."""
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return o.subtract(li).orderBy("k")


def q26c_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with provenance column, then fold — the concat-then-reduce
    shape (no dedup pass; union is free, the aggregate is the only shuffle)."""
    c = (table(spark, sf_dir, "customer")
         .select(F.col("c_nationkey").alias("k"), F.lit("cust").alias("side")))
    s = (table(spark, sf_dir, "supplier")
         .select(F.col("s_nationkey").alias("k"), F.lit("supp").alias("side")))
    return (c.unionByName(s)
            .groupBy("k", "side").agg(F.count("*").alias("n"))
            .orderBy("k", "side"))


def q26d_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nation key survives min(count in
    customer, count in supplier) times. Folded to (key, multiplicity) so
    the result is compact; the multiplicities are what distinguish ALL from
    the distinct set op."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (c.intersectAll(s)
            .groupBy("k").agg(F.count("*").alias("mult"))
            .orderBy("k"))


def q26e_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: customer nation keys surviving with
    multiplicity count(cust) - count(supp) where positive."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (c.exceptAll(s)
            .groupBy("k").agg(F.count("*").alias("mult"))
            .orderBy("k"))


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
    "q27b_in_subquery": (
        q27b_in_subquery,
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000) "
        "ORDER BY o_orderkey",
    ),
    "q26b_except": (
        q26b_except,
        "SELECT o_orderkey AS k FROM orders EXCEPT "
        "SELECT l_orderkey AS k FROM lineitem ORDER BY k",
    ),
    "q26c_union_all": (
        q26c_union_all,
        "SELECT k, side, COUNT(*) AS n FROM ("
        "SELECT c_nationkey AS k, 'cust' AS side FROM customer "
        "UNION ALL SELECT s_nationkey AS k, 'supp' AS side FROM supplier) t "
        "GROUP BY k, side ORDER BY k, side",
    ),
    "q26d_intersect_all": (
        q26d_intersect_all,
        "SELECT k, COUNT(*) AS mult FROM ("
        "SELECT c_nationkey AS k FROM customer INTERSECT ALL "
        "SELECT s_nationkey AS k FROM supplier) t "
        "GROUP BY k ORDER BY k",
    ),
    "q26e_except_all": (
        q26e_except_all,
        "SELECT k, COUNT(*) AS mult FROM ("
        "SELECT c_nationkey AS k FROM customer EXCEPT ALL "
        "SELECT s_nationkey AS k FROM supplier) t "
        "GROUP BY k ORDER BY k",
    ),
}
