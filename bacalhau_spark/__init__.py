"""bacalhau_spark — a PySpark-native analytics engine with the capabilities
of filecoin-project/bacalhau (compute-over-data), re-expressed Spark-first.

The reference (/root/reference, bacalhau v0) is a compute-over-data
orchestrator: declarative job specs executed next to content-addressed data,
with replicated execution for verification (SURVEY.md §0). This package keeps
those *semantics* — declarative specs, deterministic outputs, replicated
verification, an event-log surface — but the execution engine is Spark:
DataFrame/SQL plans optimized by Catalyst, not a hand-rolled event loop.

Layout:
  session.py    SparkSession factory with scale-oriented defaults (AQE on).
  catalog.py    fixture-table loader (TESTDATA.md parquet tables).
  functions/    reusable column expressions (dot products, shingles, hashes).
  operators/    the relational + training-data operator plane (SURVEY.md §2).
  sources/      readers (parquet/csv/json/text/binary/url) and deterministic
                sinks with manifest hashes (the IPFS-publisher analog).
  plans/        plan validation (nondeterminism gate) + canonical row hashes.
  streaming/    Structured Streaming surfaces over the events table.
  engine.py     JobSpec/Engine: submit, event log, replicated verification.
"""

__version__ = "0.1.0"
