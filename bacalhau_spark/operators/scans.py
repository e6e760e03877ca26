"""Scan + projection operators.

Reference capability: CID/URL-mounted file scans and `awk`-style field
extraction (`pkg/storage/ipfs_apicopy/storage.go:87-143`,
`pkg/test/scenario/test_scenarios.go:134-161`). Spark-first restatement:
lazy parquet scans where Catalyst prunes the read schema to exactly the
projected columns — check `.explain("formatted")` shows ``ReadSchema`` with
only the selected fields, which is what makes a 2-column projection over a
100 TB table read ~2 columns of bytes, not the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q01_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + projection (Q1). Column pruning reaches the parquet scan."""
    return (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


def q02_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with rename (Q2) — the `awk '{print $2}'` analog
    (`pkg/test/scenario/test_scenarios.go:134-161`)."""
    return (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
        .orderBy("id")
    )


QUERIES = {
    "q01_scan_projection": (
        q01_scan_projection,
        "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    ),
    "q02_project_rename": (
        q02_project_rename,
        "SELECT c_custkey AS id, c_name AS name FROM customer ORDER BY id",
    ),
}
