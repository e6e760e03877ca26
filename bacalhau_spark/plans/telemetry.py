"""Per-run execution telemetry from SQLMetrics.

The reference wraps every job in OTel spans fed by controller events
(`pkg/controller/controller.go:440-551`); the Spark analog of that
observability plane is the SQLMetric accumulators on the executed physical
plan. After an action, the plan tree carries real totals — files/bytes
scanned, shuffle bytes written, spill — which the engine folds into its
event log (a `Metrics` event per run), so regressions surface in run
history without any external UI.

PySpark exposes no QueryExecutionListener, so this walks the JVM plan via
py4j. Everything is best-effort: telemetry must never fail a run, and an
unrecognized plan shape just yields fewer fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# metric key -> output field, summed across matching plan nodes
_SCAN_METRICS = {"filesSize": "scan_bytes", "numFiles": "scan_files",
                 "numOutputRows": "scan_rows"}
_SHUFFLE_METRICS = {"shuffleBytesWritten": "shuffle_bytes_written",
                    "shuffleRecordsWritten": "shuffle_records_written",
                    "dataSize": "shuffle_data_size"}
_ANY_METRICS = {"spillSize": "spill_bytes"}


def _node_metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _walk(node, acc: dict[str, int]) -> None:
    cls = node.getClass().getSimpleName()
    metrics = _node_metrics(node)
    table = dict(_ANY_METRICS)
    if cls.endswith("ScanExec"):
        table.update(_SCAN_METRICS)
    if "ShuffleExchange" in cls:
        table.update(_SHUFFLE_METRICS)
    for key, field in table.items():
        if key in metrics:
            acc[field] = acc.get(field, 0) + int(metrics[key])
    # AQE wrappers expose their materialized subtree through accessors,
    # not children()
    if cls.startswith("AdaptiveSparkPlan"):
        _walk(node.executedPlan(), acc)
        return
    if "QueryStage" in cls:
        _walk(node.plan(), acc)
        return
    children = node.children()
    for i in range(children.length()):
        _walk(children.apply(i), acc)


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Fold the executed plan's SQLMetrics into {field: total}. Call after
    an action on `df` itself (a fresh plan reports zeros). Best-effort."""
    try:
        acc: dict[str, int] = {}
        _walk(df._jdf.queryExecution().executedPlan(), acc)
        return acc
    except Exception:  # noqa: BLE001 — telemetry never fails a run
        return {}


def execute_and_measure(df: DataFrame) -> dict[str, int]:
    """Execute a plan once entirely JVM-side (no rows reach the driver) and
    return its metrics + result row count. This replaces `df.count()` for
    'run for effect' paths: count() builds a separate aggregate plan whose
    metrics would not describe the user's query."""
    try:
        jqe = df._jdf.queryExecution()
        n = jqe.executedPlan().execute().count()
    except Exception as exc:  # noqa: BLE001
        # Job cancellation (the engine's timeout watchdog) must propagate —
        # the fallback below would RE-RUN the query the watchdog just
        # killed. Only plan-shape surprises take the plain-action fallback.
        if "CANCELLED" in str(exc).upper():
            raise
        df.count()
        return {}
    metrics = {"result_rows": int(n)}
    try:
        _walk(jqe.executedPlan(), metrics)
    except Exception:  # noqa: BLE001 — telemetry never fails a run
        pass
    return metrics
