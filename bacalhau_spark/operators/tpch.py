"""TPC-H-shaped composite queries beyond the declared Q1-Q30 set.

Each exercises a distinct Catalyst path the simpler queries don't:
correlated EXISTS with a non-equi residual (Q4), conditional aggregation
over a join (Q12), ratio-of-filtered-sums (Q14), disjunctive OR-of-ANDs
pushdown (Q19), anti-join + scalar-subquery combination (Q22), and
min-per-group join-back (Q2's inner correlated min, restated over the
lineitem-derived part-supplier pairs since the fixtures carry no partsupp
table). All oracle-checked.

Reference parity note: the reference has none of this (SURVEY.md §2.6);
these are the "user switches from containers to the engine" workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: priority counts of 1996 orders having at least one line
    shipped after the order date — EXISTS with a cross-table residual
    (l_shipdate > o_orderdate), which decorrelates to a left-semi join with
    the residual evaluated inside the join."""
    orders = (table(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1997-01-01")))
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == li.l_orderkey) & \
           (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


def tpch_q12_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: per return flag, how many lines belong to high- vs
    low-priority orders — conditional aggregation (sum of CASE) over the
    fact-fact join."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


def tpch_q14_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share for one month — ratio of two filtered
    sums in a single aggregate over lineitem joined to a broadcast part."""
    li = (table(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1996-03-01")
                 & (F.col("l_shipdate") < "1996-04-01"))
          .select("l_partkey", "l_extendedprice", "l_discount"))
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(100 * F.sum(promo) / F.sum(rev), 6)
             .alias("promo_revenue_pct"))
    )


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides — revenue from three
    alternative (brand, size, quantity) channels. Catalyst extracts the
    common join key and pushes the per-side conjuncts below the join."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand",
                                               "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    channel = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 50)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return j.where(channel).agg(
        F.count("*").alias("n"),
        F.round(F.sum(rev), 2).alias("revenue"))


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per nation key, count + balance of above-average-balance
    customers with no urgent orders — scalar subquery (global avg) combined
    with a filtered anti join, both decorrelated by Catalyst into
    broadcasts. (The fixture gives every customer at least one order, so
    the anti side filters to urgent ones to keep the result non-trivial.)"""
    customer = table(spark, sf_dir, "customer")
    pos_avg = (customer.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("_avg")))
    orders = (table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (
        customer.crossJoin(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


def tpch_q2_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated inner min, over the lineitem-derived (part, supplier)
    pairs: for each of the first 200 parts, the supplying supplier with the
    lowest account balance. Window rank per part (one shuffle on partkey),
    deterministic tie-break on suppkey — the min-per-group join-back."""
    pairs = (table(spark, sf_dir, "lineitem")
             .where(F.col("l_partkey") < 200)
             .select("l_partkey", "l_suppkey").distinct())
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                                   "s_acctbal")
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        pairs.join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("l_partkey").alias("p_partkey"), "s_suppkey", "s_name",
                "s_acctbal")
        .orderBy("p_partkey")
    )


QUERIES = {
    "tpch_q4_exists": (
        tpch_q4_exists,
        "SELECT o_orderpriority, COUNT(*) AS n FROM orders o "
        "WHERE o_orderdate >= DATE '1996-01-01' "
        "AND o_orderdate < DATE '1997-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    ),
    "tpch_q12_conditional": (
        tpch_q12_conditional,
        "SELECT l_returnflag, "
        "SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS high_line_count, "
        "SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag ORDER BY l_returnflag",
    ),
    "tpch_q14_ratio": (
        tpch_q14_ratio,
        "SELECT ROUND(100 * SUM(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= DATE '1996-03-01' "
        "AND l_shipdate < DATE '1996-04-01'",
    ),
    "tpch_q19_disjunctive": (
        tpch_q19_disjunctive,
        "SELECT COUNT(*) AS n, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#11' AND p_size <= 10 "
        "AND l_quantity BETWEEN 1 AND 20) "
        "OR (p_brand = 'Brand#22' AND p_size <= 25 "
        "AND l_quantity BETWEEN 10 AND 30) "
        "OR (p_brand = 'Brand#33' AND p_size <= 50 "
        "AND l_quantity BETWEEN 20 AND 40)",
    ),
    "tpch_q22_idle_customers": (
        tpch_q22_idle_customers,
        "SELECT c_nationkey, COUNT(*) AS numcust, "
        "ROUND(SUM(c_acctbal), 2) AS totacctbal FROM customer c "
        "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
        "WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') "
        "GROUP BY c_nationkey ORDER BY c_nationkey",
    ),
    "tpch_q2_min_per_group": (
        tpch_q2_min_per_group,
        "SELECT p_partkey, s_suppkey, s_name, s_acctbal FROM ("
        "SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal, "
        "ROW_NUMBER() OVER (PARTITION BY l_partkey "
        "ORDER BY s_acctbal, s_suppkey) AS rn "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
        "WHERE l_partkey < 200) ps "
        "JOIN supplier ON l_suppkey = s_suppkey) t "
        "WHERE rn = 1 ORDER BY p_partkey",
    ),
}
