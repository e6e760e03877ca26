"""Submit-time plan validation.

Two reference behaviors restated at the plan level:

1. Syntax gate — the reference shell-checks entrypoints before submitting
   (`pkg/system/script_checker.go:12-61`, used in
   `cmd/bacalhau/docker_run.go:427-442`). Spark analog: parse/analyze the
   query *without executing* (Catalyst analysis raises on bad references).
2. Determinism gate — the reference gets determinism by construction
   (single-threaded pyodide WASM, `pkg/executor/python_wasm/executor.go:3-7`).
   Spark analog: reject plans containing nondeterministic expressions when
   the job runs in verified mode (replicated execution compares output
   hashes, engine.py — a plan with rand()/current_timestamp() can never
   verify).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Expression names that poison replicated verification. Checked against the
# analyzed (pre-optimization) plan so aliasing can't hide them.
NONDETERMINISTIC_PATTERNS = (
    r"\brand\(", r"\brandn\(", r"\buuid\(", r"\bshuffle\(",
    r"\bmonotonically_increasing_id\(", r"\bcurrent_timestamp\(",
    r"\bcurrent_date\(", r"\bnow\(", r"\bunix_timestamp\(\)",
    r"\binput_file_name\(", r"\bspark_partition_id\(",
)


class NondeterministicPlanError(ValueError):
    """Raised when a verified-mode plan contains nondeterministic exprs."""


def analyzed_plan(df: DataFrame) -> str:
    """The analyzed logical plan as text (no execution)."""
    return df._jdf.queryExecution().analyzed().toString()


def validate_sql(spark: SparkSession, sql: str) -> None:
    """Parse+analyze a SQL string without running it — the CheckBashSyntax
    analog. Raises pyspark's AnalysisException on errors."""
    spark.sql(sql).schema  # forces analysis only


def _iter_scala_seq(seq):
    for i in range(seq.size()):
        yield seq.apply(i)


def nondeterministic_exprs(df: DataFrame) -> list[str]:
    """Walk the analyzed Catalyst plan and return expressions whose
    `deterministic` flag is false — catches nondeterministic Python UDFs
    (asNondeterministic) and any builtin the name-pattern list misses.
    Expression.deterministic already folds in its children, so checking each
    plan node's top-level expressions suffices."""
    bad: list[str] = []

    def walk(plan) -> None:
        for e in _iter_scala_seq(plan.expressions()):
            if not e.deterministic():
                bad.append(e.toString())
        for child in _iter_scala_seq(plan.children()):
            walk(child)

    walk(df._jdf.queryExecution().analyzed())
    return bad


def assert_deterministic(df: DataFrame) -> None:
    """Reject plans that cannot produce stable output hashes. Two layers:
    the Catalyst `deterministic` flag (true nondeterminism, incl. UDFs), and
    a name-pattern list for expressions Catalyst treats as query-constant
    but that vary across replicated runs (current_timestamp & co.)."""
    hits: list[str] = nondeterministic_exprs(df)
    plan = analyzed_plan(df).lower()
    hits += [p for p in NONDETERMINISTIC_PATTERNS if re.search(p, plan)]
    if hits:
        raise NondeterministicPlanError(
            f"plan contains nondeterministic expressions ({hits}); "
            "verified-mode jobs must be deterministic")
