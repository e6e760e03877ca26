"""Filter / predicate operators.

Reference capability: `grep` substring filters and `sed -n /re/p` regex row
selection (`pkg/test/scenario/test_scenarios.go:77-132`; the gps-substitution
example's regex filter over a 3M-row CSV,
`examples/gps-substitution/README.md:1-10`). Spark-first restatement:
declarative predicates — simple comparisons are pushed into the parquet scan
(`PushedFilters` in `.explain`), regex/LIKE run inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q09_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring filter (Q9) — the grep analog
    (`pkg/test/scenario/test_scenarios.go:77-103`)."""
    return (
        table(spark, sf_dir, "documents")
        .where(F.col("text").like("%data%"))
        .select("doc_id")
        .orderBy("doc_id")
    )


def q10_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex filter (Q10) — the `sed -n /re/p` analog
    (`pkg/test/scenario/test_scenarios.go:105-132`)."""
    return (
        table(spark, sf_dir, "documents")
        .where(F.regexp_like(F.col("text"), F.lit("spark [a-z]+ (fast|slow)")))
        .select("doc_id")
        .orderBy("doc_id")
    )


QUERIES = {
    "q09_like_filter": (
        q09_like_filter,
        "SELECT doc_id FROM documents WHERE text LIKE '%data%' ORDER BY doc_id",
    ),
    "q10_regex_filter": (
        q10_regex_filter,
        "SELECT doc_id FROM documents "
        "WHERE regexp_matches(text, 'spark [a-z]+ (fast|slow)') ORDER BY doc_id",
    ),
}
