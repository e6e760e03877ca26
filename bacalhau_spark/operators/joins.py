"""Join operators (equi / anti / multi-way / theta).

Absent in the reference (its users ship joins as code inside containers,
`pkg/executor/python_wasm/executor.go:48-73`); first-class here. Scale notes
per query in docstrings — the 100 TB plan is: broadcast the dimension chain
(region/nation: tiny, customer: still small relative to lineitem), shuffle
hash-join only on the fact-fact edge, and let AQE split skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q13_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation + count per nation (Q13). nation is 25 rows at any
    SF — broadcast, so the only shuffle is the final 25-group aggregate
    (map-side partials make it negligible)."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation),
                      customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
        .orderBy("n_name")
    )


def q14_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no lineitem (Q14) — left anti join. At scale both sides
    shuffle on orderkey; lineitem is pre-projected to the single join column
    so the shuffle payload is one bigint per row."""
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


def q15_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way join revenue rollup (Q15, TPC-H Q5 shape). The dimension chain
    customer⋈nation⋈region is broadcast (small at the declared scale’s dim
    sizes); lineitem⋈orders is the one real shuffle. AQE re-plans if the
    estimate is wrong."""
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.round(F.sum(rev), 2).alias("rev"))
        .orderBy("r_name")
    )


def q16_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join with residual theta predicate (Q16). The equi component
    (custkey) makes this a hash join with a post-join filter — NOT a
    broadcast-nested-loop — so it scales like any equi join."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cond = (orders.o_custkey == customer.c_custkey) & \
           (orders.o_totalprice > customer.c_acctbal)
    return (
        customer.join(orders, cond)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .orderBy("c_custkey")
    )


def q13b_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: suppliers whose nation has customers (existence only —
    the build side is deduped before probing, so the output never fans out)."""
    supplier = table(spark, sf_dir, "supplier")
    customer = table(spark, sf_dir, "customer").select("c_nationkey")
    return (
        supplier.join(customer,
                      supplier.s_nationkey == customer.c_nationkey,
                      "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q14b_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched rows: per-order lineitem count
    including zero. Aggregate-then-join (the count collapses lineitem to one
    row per orderkey BEFORE the join) so the outer join's shuffle carries
    pre-aggregated rows, not the raw fact table."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    licnt = (table(spark, sf_dir, "lineitem")
             .groupBy("l_orderkey").agg(F.count("*").alias("cnt")))
    return (
        orders.join(licnt, orders.o_orderkey == licnt.l_orderkey, "left")
        .select("o_orderkey",
                F.coalesce(F.col("cnt"), F.lit(0)).alias("n_items"))
        .orderBy("o_orderkey")
    )


def qj_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides: customer count vs
    supplier count per nation key. Both sides collapse to ≤25 rows before
    the join — the full-outer exchange is constant-size at any SF."""
    c = (table(spark, sf_dir, "customer")
         .groupBy(F.col("c_nationkey").alias("k"))
         .agg(F.count("*").alias("n_cust")))
    s = (table(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("k2"))
         .agg(F.count("*").alias("n_supp")))
    return (
        c.join(s, c.k == s.k2, "full_outer")
        .select(F.coalesce(F.col("k"), F.col("k2")).alias("k"),
                F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
        .orderBy("k")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join + aggregate + top-10 — the
    composite pipeline (scan with pushed predicates -> broadcast dim join ->
    fact shuffle join -> partial+final agg -> TakeOrdered). Filters sit on
    each scan so parquet prunes row groups before any join."""
    cutoff = "1995-03-15"
    customer = (table(spark, sf_dir, "customer")
                .where(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey"))
    orders = (table(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < cutoff)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    lineitem = (table(spark, sf_dir, "lineitem")
                .where(F.col("l_shipdate") > cutoff)
                .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SALT_BUCKETS = 8


def nd_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join: events cluster on ~150 hot user keys
    while customer has 10x more — the shape where one reducer gets a hot
    key's whole partition. Salting spreads each hot key over SALT_BUCKETS
    reducers: the fact side appends salt = hash(row) % S to the key, the dim
    side replicates each row S times (explode over a literal sequence), and
    the join key becomes (key, salt). Semantics identical to the plain join
    (oracle is the unsalted SQL); AQE's skew split is the automatic cousin —
    this operator is the explicit form for engines/pipelines that pin it.
    """
    events = table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(SALT_BUCKETS)))
    customer = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment",
                F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
                .alias("salt"))
    )
    return (
        events.join(customer,
                    (events.user_id == customer.c_custkey)
                    & (events.salt == customer.salt))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 3).alias("total"))
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "q13_join_agg": (
        q13_join_agg,
        "SELECT n_name, COUNT(*) AS c FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n_name",
    ),
    "q14_anti_join": (
        q14_anti_join,
        "SELECT o_orderkey FROM orders o WHERE NOT EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) "
        "ORDER BY o_orderkey",
    ),
    "q15_multiway_join": (
        q15_multiway_join,
        "SELECT r_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name ORDER BY r_name",
    ),
    "q16_theta_join": (
        q16_theta_join,
        "SELECT c_custkey, COUNT(*) AS n FROM customer c JOIN orders o "
        "ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal "
        "GROUP BY c_custkey ORDER BY c_custkey",
    ),
    "q13b_semi_join": (
        q13b_semi_join,
        "SELECT s_suppkey, s_name FROM supplier s WHERE EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey) "
        "ORDER BY s_suppkey",
    ),
    "q14b_left_join_agg": (
        q14b_left_join_agg,
        "SELECT o_orderkey, COALESCE(cnt, 0) AS n_items FROM orders "
        "LEFT JOIN (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem "
        "GROUP BY l_orderkey) li ON o_orderkey = l_orderkey "
        "ORDER BY o_orderkey",
    ),
    "q3_shipping_priority": (
        q3_shipping_priority,
        "SELECT l_orderkey, o_orderdate, o_orderpriority, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1995-03-15' "
        "AND l_shipdate > DATE '1995-03-15' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10",
    ),
    "nd_salted_join": (
        nd_salted_join,
        "SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(value), 3) AS total "
        "FROM events JOIN customer ON user_id = c_custkey "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment",
    ),
    "qj_full_outer": (
        qj_full_outer,
        "SELECT COALESCE(c.k, s.k2) AS k, COALESCE(n_cust, 0) AS n_cust, "
        "COALESCE(n_supp, 0) AS n_supp FROM "
        "(SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c "
        "FULL OUTER JOIN "
        "(SELECT s_nationkey AS k2, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s "
        "ON c.k = s.k2 ORDER BY k",
    ),
}
