"""Per-row scalar function plane (the reference's "map" executors).

Reference capability: arbitrary per-row transforms shipped as containers —
`sed` string rewrites, `awk` math, python-in-WASM
(`pkg/executor/docker/executor.go:104-341`,
`pkg/executor/python_wasm/executor.go:48-73`). Spark-first restatement:
built-in scalar functions (JVM-side, inside whole-stage codegen) — the 10-100×
faster path vs. shipping Python per row. All six type families the reference's
example jobs touch: string, math, date, conditional, array, json/map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q03_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String rewrite (Q3) — the `sed s/.../.../g` analog
    (`pkg/test/scenario/test_scenarios.go:105-132`)."""
    return (
        table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        )
        .orderBy("p_partkey")
    )


def q04_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic (Q4) — the `awk` per-row math analog
    (`pkg/test/scenario/test_scenarios.go:134-161`)."""
    # NOTE: no ROUND here on purpose. The raw per-row double arithmetic is
    # bit-identical across engines (same IEEE ops in the same order), while
    # ROUND-of-double semantics differ on .xx5 boundaries (Spark rounds the
    # exact binary value via BigDecimal; DuckDB multiplies then rounds).
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", charge.alias("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    )


def q05_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction (Q5). Session TZ is pinned UTC (session.py) so
    year/month are cluster-independent."""
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .orderBy("o_orderkey")
    )


def q06_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN bucketing (Q6)."""
    bucket = (
        F.when(F.col("o_totalprice") > 100000, "big")
        .when(F.col("o_totalprice") > 10000, "mid")
        .otherwise("small")
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", bucket.alias("bucket"))
        .orderBy("o_orderkey")
    )


def q07_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings (Q7). aggregate() keeps
    the fold in the JVM; the accumulator is double so float inputs are
    promoted per element (same as the oracle)."""
    # Raw (unrounded) fold: both engines fold left-to-right over the same
    # floats promoted to double, so the result is bit-identical — see q04's
    # note on why rounding would *reduce* cross-engine stability.
    vsum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            vsum.alias("vsum"),
        )
        .orderBy("vec_id")
    )


def q08_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (Q8)."""
    return (
        table(spark, sf_dir, "events")
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .orderBy("event_id")
    )


QUERIES = {
    "q03_string_funcs": (
        q03_string_funcs,
        "SELECT p_partkey, UPPER(p_brand) AS brand, "
        "REPLACE(p_type, ' ', '_') AS type_slug FROM part ORDER BY p_partkey",
    ),
    "q04_math_funcs": (
        q04_math_funcs,
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber",
    ),
    "q05_date_funcs": (
        q05_date_funcs,
        "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, "
        "CAST(year(o_orderdate) AS INTEGER) AS y, "
        "CAST(month(o_orderdate) AS INTEGER) AS m FROM orders ORDER BY o_orderkey",
    ),
    "q06_conditional": (
        q06_conditional,
        "SELECT o_orderkey, CASE WHEN o_totalprice > 100000 THEN 'big' "
        "WHEN o_totalprice > 10000 THEN 'mid' ELSE 'small' END AS bucket "
        "FROM orders ORDER BY o_orderkey",
    ),
    "q07_array_funcs": (
        q07_array_funcs,
        "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, "
        "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vsum "
        "FROM embeddings ORDER BY vec_id",
    ),
    "q08_json_funcs": (
        q08_json_funcs,
        "SELECT event_id, json_extract_string(props, '$.k') AS k "
        "FROM events ORDER BY event_id",
    ),
}
