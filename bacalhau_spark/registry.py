"""Central query registry — merges every operator module's QUERIES table.

The driver contract (__spark_entry__.py) and the pytest oracle harness both
read from here, so a query exists exactly once: Spark implementation + DuckDB
oracle side by side (SURVEY.md §2's declared queries Q1–Q30 plus the nd_*
training-data operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bacalhau_spark.functions import udfs
from bacalhau_spark.operators import (aggregates, asof, dedup, filters, joins,
                                      multimodal, pipeline, scalar, scans,
                                      setops, sort, similarity, text, tpch,
                                      windows)
from bacalhau_spark.sources import sinks
from bacalhau_spark.streaming import events as streaming_events

_MODULES = (scans, scalar, filters, joins, aggregates, windows, sort, setops,
            asof, dedup, similarity, text, multimodal, sinks, streaming_events,
            udfs, tpch, pipeline)

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, tuple[QueryFn, str | None]] = {}
for _m in _MODULES:
    for _name, _pair in _m.QUERIES.items():
        if _name in ALL_QUERIES:
            raise RuntimeError(f"duplicate query name {_name} in {_m.__name__}")
        ALL_QUERIES[_name] = _pair


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in ALL_QUERIES.items()
            if sql is not None}
