"""Engine: declarative job specs, an event-log run history, and replicated
verification — the reference's control-plane *semantics* on a single Spark
driver.

Mapping (SURVEY.md §1, §3):
- JobSpec (`pkg/executor/types.go:57-87`, YAML/JSON documents parsed by
  `cmd/bacalhau/apply.go:60-176`) → a declarative pipeline spec: named query
  + inputs + sink, loadable from YAML/JSON.
- Controller submit + event fold (`pkg/controller/controller.go:127-158`,
  state fold `pkg/executor/constants.go:211-250`) → an append-only event log;
  current state = max-ordinal event per run (the Q20 query shape, dogfooded).
- Deal.Concurrency / replicated execution + results acceptance
  (`pkg/executor/types.go:138-142`, `pkg/requesternode/requesternode.go:89-121`,
  `pkg/controller/controller.go:211-241`) → run the same deterministic plan N
  times and compare content manifests; mismatch ⇒ ResultsRejected.
"""

from __future__ import annotations

import json
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from bacalhau_spark.plans.validation import assert_deterministic
from bacalhau_spark.sources.sinks import result_manifest

# Event names follow `pkg/executor/constants.go:44-89`.
EVT_CREATED = "Created"
EVT_RUNNING = "Running"
EVT_METRICS = "Metrics"  # execution telemetry (OTel-span analog)
EVT_COMPLETED = "Completed"
EVT_ERROR = "Error"
EVT_RESULTS_ACCEPTED = "ResultsAccepted"
EVT_RESULTS_REJECTED = "ResultsRejected"
EVT_REJECTED = "Rejected"


def build_context_archive(context_dir: str,
                          max_bytes: int = 10 << 20) -> str:
    """Package a working directory for shipping to executors — the
    `run python` context-upload analog (`cmd/bacalhau/run_python.go:145-167`
    tars ≤10 MiB of CWD; the server pins it, `pkg/publicapi/server.go:470-535`).

    The zip is named by a hash of its CONTENT (relative paths + bytes), the
    CID-pinning story: identical contexts map to the same artifact, so
    re-submits re-register the same path instead of colliding on Spark's
    one-basename-one-file rule. Returns the archive path for
    `sparkContext.addPyFile`."""
    import hashlib
    import os
    import pathlib
    import zipfile

    from bacalhau_spark.scratch import scratch_root

    base = pathlib.Path(context_dir)
    if not base.is_dir():
        raise ValueError(f"context {context_dir!r} is not a directory")
    files = sorted(p for p in base.rglob("*") if p.is_file())
    total = sum(p.stat().st_size for p in files)
    if total > max_bytes:
        raise ValueError(
            f"context {context_dir!r} is {total} bytes; max {max_bytes}")
    digest = hashlib.sha256()
    for p in files:
        digest.update(str(p.relative_to(base)).encode())
        digest.update(b"\0")
        digest.update(p.read_bytes())
    out = os.path.join(scratch_root(), f"ctx-{digest.hexdigest()[:16]}.zip")
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in files:
                zf.write(p, arcname=str(p.relative_to(base)))
    return out


class JobRejectedError(RuntimeError):
    """A submit-time policy hook declined the job (the SelectJob=false
    path, `pkg/computenode/computenode.go:348-405`)."""


class ResultsRejectedError(RuntimeError):
    """Replica manifests disagreed — the results-rejected path
    (`pkg/controller/controller.go:211-241`). Raised so callers get a hard
    failure signal instead of having to poll state(); nothing is published."""


@dataclass
class JobSpec:
    """Declarative job document (the `testdata/job.yaml` shape, re-typed for
    a query engine): which query, over which inputs, with what guarantees."""
    query: str                      # name in the engine's query registry
    inputs: dict = field(default_factory=dict)   # e.g. {"sf_dir": "..."}
    outputs: dict = field(default_factory=dict)  # e.g. {"path": "...", "format": "parquet"}
    replicas: int = 1               # Deal.Concurrency analog
    verified: bool = False          # enforce deterministic plan + manifest compare
    annotations: list = field(default_factory=list)
    resources: dict = field(default_factory=dict)  # {"cpu": "500m", "memory": "2Gb", ...}
    context: str | None = None      # dir shipped to executors (run-python context analog)

    def __post_init__(self) -> None:
        # Validate + sanitize at construction (the reference validates specs
        # at submit: resources `pkg/capacitymanager/capacitymanager.go:61-179`,
        # labels `pkg/job/util.go:8-23`). Bad resource strings raise here.
        from bacalhau_spark.resources import (sanitize_annotation,
                                              to_local_properties,
                                              to_spark_conf)
        # Two-tier resource application: executor sizing keys go into
        # session construction (cli.py threads them into the builder);
        # the scheduler pool is applied per-job at submit time.
        self.spark_conf = to_spark_conf(self.resources)
        self.local_properties = to_local_properties(self.resources)
        self.annotations = [sanitize_annotation(str(a))
                            for a in self.annotations]

    @classmethod
    def from_dict(cls, doc: dict) -> "JobSpec":
        known = {k: doc[k] for k in
                 ("query", "inputs", "outputs", "replicas", "verified",
                  "annotations", "resources", "context") if k in doc}
        if "query" not in known:
            raise ValueError("job spec requires a 'query' field")
        return cls(**known)

    @classmethod
    def load(cls, path: str) -> "JobSpec":
        """Load a YAML or JSON job document (`cmd/bacalhau/apply.go:60-176`
        analog). YAML support is optional (import-gated)."""
        with open(path) as f:
            raw = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml  # type: ignore
                return cls.from_dict(yaml.safe_load(raw))
            except ImportError:
                raise RuntimeError("pyyaml not installed; use JSON specs")
        return cls.from_dict(json.loads(raw))


@dataclass
class JobEvent:
    run_id: str
    ordinal: int
    name: str
    ts: float
    detail: str = ""


class Engine:
    """Single-driver engine with the reference's run-lifecycle semantics."""

    def __init__(self, spark: SparkSession,
                 registry: dict[str, Callable[[SparkSession, str], DataFrame]],
                 policies: list[Callable[[JobSpec], bool]] | None = None):
        """`policies` are submit-time selection hooks — the reference's
        JobSelectionPolicy / exec-probe / http-probe plane
        (`pkg/computenode/job_selection.go:23-101`) as plain Python
        callables: each gets the spec; return False (or raise) to decline
        the job before any Spark work starts."""
        self.spark = spark
        self.registry = dict(registry)
        self.policies = list(policies or [])
        self._events: list[JobEvent] = []
        self._ordinals: dict[str, int] = {}
        self._specs: dict[str, JobSpec] = {}

    # -- event log ---------------------------------------------------------
    def _emit(self, run_id: str, name: str, detail: str = "") -> None:
        ordinal = self._ordinals.get(run_id, 0) + 1
        self._ordinals[run_id] = ordinal
        self._events.append(JobEvent(run_id, ordinal, name, time.time(), detail))

    def events(self, run_id: str | None = None) -> list[JobEvent]:
        return [e for e in self._events
                if run_id is None or e.run_id == run_id]

    def state(self, run_id: str) -> str:
        """Current state = max-ordinal event (`pkg/job/job.go:233-259`)."""
        evts = self.events(run_id)
        if not evts:
            raise KeyError(f"unknown run {run_id}")
        return max(evts, key=lambda e: e.ordinal).name

    def list_runs(self) -> dict[str, str]:
        return {rid: self.state(rid) for rid in self._ordinals}

    def events_df(self) -> DataFrame:
        """The run log as a DataFrame — the reference's LocalDB views
        (`pkg/publicapi/server.go:195-312`) as queryable tables."""
        rows = [(e.run_id, e.ordinal, e.name, e.ts, e.detail)
                for e in self._events]
        return self.spark.createDataFrame(
            rows, "run_id string, ordinal int, name string, ts double, "
                  "detail string")

    def states_df(self) -> DataFrame:
        """Current state per run — the engine's own Q20 fold (max-ordinal
        event wins, `pkg/job/job.go:233-259`) run through its own operator
        plane (dogfooding)."""
        from pyspark.sql import functions as F
        return (self.events_df()
                .groupBy("run_id")
                .agg(F.max_by("name", "ordinal").alias("state")))

    def describe(self, run_id: str) -> dict:
        """Full run description: spec, state, event history, result manifest
        — the `bacalhau describe` view (`cmd/bacalhau/describe.go:73-176`)."""
        evts = sorted(self.events(run_id), key=lambda e: e.ordinal)
        if not evts:
            raise KeyError(f"unknown run {run_id}")
        spec = self._specs.get(run_id)
        manifest = next(
            (e.detail for e in reversed(evts)
             if e.name in (EVT_RESULTS_ACCEPTED, EVT_COMPLETED) and e.detail),
            "")
        return {
            "run_id": run_id,
            "query": spec.query if spec else None,
            "state": evts[-1].name,
            "replicas": spec.replicas if spec else 1,
            "verified": spec.verified if spec else False,
            "outputs": dict(spec.outputs) if spec else {},
            "annotations": list(spec.annotations) if spec else [],
            "manifest": manifest,
            "events": [{"ordinal": e.ordinal, "name": e.name, "ts": e.ts,
                        "detail": e.detail} for e in evts],
        }

    def fetch_results(self, run_id: str, limit: int = 100) -> list[dict]:
        """Read back a completed run's published output — the
        `bacalhau get` analog (`cmd/bacalhau/get.go:36-129`): results come
        from the run's sink, not from re-executing the plan."""
        spec = self._specs.get(run_id)
        if spec is None:
            raise KeyError(f"unknown run {run_id}")
        path = spec.outputs.get("path")
        if not path:
            raise ValueError(f"run {run_id} has no output sink to fetch")
        df = self.spark.read.format(
            spec.outputs.get("format", "parquet")).load(path)
        return [row.asDict(recursive=True) for row in df.limit(limit).collect()]

    # -- submit / run ------------------------------------------------------
    def submit(self, spec: JobSpec) -> str:
        """Run a spec to completion; returns the run id. Replicated,
        verified specs compare content manifests across replicas."""
        if spec.query not in self.registry:
            raise KeyError(f"unknown query {spec.query!r}")
        run_id = uuid.uuid4().hex[:12]
        self._specs[run_id] = spec
        self._emit(run_id, EVT_CREATED, spec.query)
        for policy in self.policies:
            if not policy(spec):
                self._emit(run_id, EVT_REJECTED,
                           getattr(policy, "__name__", "policy"))
                raise JobRejectedError(
                    f"job declined by policy "
                    f"{getattr(policy, '__name__', 'policy')!r}")
        # Job-scoped runtime conf: tag every Spark job this run launches
        # (group id + description for the UI/event log) and route it to the
        # scheduler pool its resource request maps to. Local properties are
        # inherited by all actions triggered below and restored on exit, so
        # concurrent/subsequent runs don't leak each other's pool.
        sc = self.spark.sparkContext
        props = {"spark.jobGroup.id": run_id,
                 "spark.job.description": f"bacalhau-spark:{spec.query}",
                 **spec.local_properties}
        prev = {k: sc.getLocalProperty(k) for k in props}
        for k, v in props.items():
            sc.setLocalProperty(k, v)
        try:
            if spec.context:
                # Ship the job's working-dir modules to driver + executors
                # before the query builds any UDF that imports them.
                archive = build_context_archive(spec.context)
                self.spark.sparkContext.addPyFile(archive)
            fn = self.registry[spec.query]
            sf_dir = spec.inputs.get("sf_dir", "/root/testdata/sf0.001")
            df = fn(self.spark, sf_dir)
            if spec.verified:
                assert_deterministic(df)
            self._emit(run_id, EVT_RUNNING,
                       spec.local_properties.get("spark.scheduler.pool", ""))
            out = spec.outputs.get("path")
            t_exec = time.time()
            run_metrics: dict = {}
            # Verify BEFORE publish (the reference gates publishing on
            # results acceptance): replica manifests are compared first and
            # a mismatch aborts the run with nothing written.
            manifests = []
            if spec.verified or spec.replicas > 1:
                manifests = [
                    result_manifest(df,
                                    metrics_out=run_metrics if i == 0 else None)
                    for i in range(max(1, spec.replicas))]
                if len(set(manifests)) != 1:
                    self._emit(run_id, EVT_RESULTS_REJECTED,
                               ";".join(manifests))
                    raise ResultsRejectedError(
                        f"run {run_id}: replica manifests disagree: "
                        f"{sorted(set(manifests))}")
            elif not out:
                # no sink — execute once, harvesting the plan's SQLMetrics
                from bacalhau_spark.plans.telemetry import execute_and_measure
                run_metrics.update(execute_and_measure(df))
            if out:
                df.write.mode("overwrite").format(
                    spec.outputs.get("format", "parquet")).save(out)
            run_metrics["wall_s"] = round(time.time() - t_exec, 3)
            self._emit(run_id, EVT_METRICS,
                       json.dumps(run_metrics, sort_keys=True))
            self._emit(run_id, EVT_COMPLETED,
                       manifests[0] if manifests else "")
            if manifests:
                self._emit(run_id, EVT_RESULTS_ACCEPTED, manifests[0])
        except ResultsRejectedError:
            raise  # already recorded as ResultsRejected — terminal state
        except Exception as exc:  # noqa: BLE001 — recorded, then re-raised
            self._emit(run_id, EVT_ERROR, repr(exc))
            raise
        finally:
            for k, v in prev.items():
                sc.setLocalProperty(k, v)
        return run_id
