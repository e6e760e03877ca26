"""Operator plane — one module per operator family from SURVEY.md §2.

Every module exposes ``QUERIES: dict[str, tuple[fn, oracle_sql|None]]`` where
``fn(spark, sf_dir) -> DataFrame`` is the Spark-first implementation and
``oracle_sql`` is the equivalent DuckDB SQL for the differential correctness
gate (None ⇒ not SQL-expressible; the driver records a rows-only check).
"""
