"""Engine lifecycle tests — the reference's control-plane semantics.

Mirrors the reference's test strategy (SURVEY.md §5): scenario-style
end-to-end runs through the engine surface, concurrency/verification
semantics (`pkg/test/devstack/concurrency_test.go:46-106` analog), and the
event fold (`pkg/executor/constants.go:211-250`).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bacalhau_spark.engine import (EVT_COMPLETED, EVT_CREATED, EVT_ERROR,
                                   EVT_RESULTS_ACCEPTED, Engine, JobSpec)
from bacalhau_spark.registry import queries

from tests.conftest import SF_DIR


@pytest.fixture()
def engine(spark):
    return Engine(spark, queries())


def test_submit_runs_to_completion(engine):
    run_id = engine.submit(JobSpec(query="q01_scan_projection",
                                   inputs={"sf_dir": SF_DIR}))
    assert engine.state(run_id) == EVT_COMPLETED
    names = [e.name for e in engine.events(run_id)]
    assert names[0] == EVT_CREATED
    assert names[-1] == EVT_COMPLETED


def test_replicated_verification_accepts_deterministic_plan(engine):
    """Concurrency=2 analog: two replicas of a deterministic plan must agree
    on the content manifest ⇒ ResultsAccepted."""
    run_id = engine.submit(JobSpec(query="q17_hash_agg",
                                   inputs={"sf_dir": SF_DIR},
                                   replicas=2, verified=True))
    assert engine.state(run_id) == EVT_RESULTS_ACCEPTED


def test_verified_mode_rejects_nondeterministic_plan(engine, spark):
    def bad_query(spark_, sf_dir):
        from bacalhau_spark.catalog import table
        return table(spark_, sf_dir, "nation").withColumn("r", F.rand())

    engine.registry["bad_rand"] = bad_query
    with pytest.raises(Exception, match="nondeterministic"):
        engine.submit(JobSpec(query="bad_rand", inputs={"sf_dir": SF_DIR},
                              verified=True))
    run_id = next(iter(engine.list_runs()))
    assert engine.state(run_id) == EVT_ERROR


def test_resources_applied_as_job_scoped_conf(engine, spark):
    """A spec with resources observably changes the job-scoped config: the
    scheduler pool + job group are set as local properties while the run's
    Spark jobs execute, and restored afterwards (capacitymanager analog)."""
    captured = {}

    def probing_query(spark_, sf_dir):
        sc = spark_.sparkContext
        captured["pool"] = sc.getLocalProperty("spark.scheduler.pool")
        captured["group"] = sc.getLocalProperty("spark.jobGroup.id")
        from bacalhau_spark.catalog import table
        return table(spark_, sf_dir, "nation")

    engine.registry["probe"] = probing_query
    rid = engine.submit(JobSpec(query="probe", inputs={"sf_dir": SF_DIR},
                                resources={"cpu": "8", "memory": "2Gb"}))
    assert captured["pool"] == "bacalhau-heavy"
    assert captured["group"] == rid
    # restored after the run — no leak into subsequent work
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") is None
    # gpu requests route to the gpu pool; submit-time keys still computed
    spec = JobSpec(query="probe", resources={"gpu": 1, "cpu": "500m"})
    assert spec.local_properties["spark.scheduler.pool"] == "bacalhau-gpu"
    assert spec.spark_conf["spark.task.resource.gpu.amount"] == "1"


def test_results_rejected_blocks_publish(engine, tmp_path, monkeypatch):
    """Verify-then-publish: disagreeing replica manifests must abort BEFORE
    the sink write and raise (results acceptance gates publishing in the
    reference controller)."""
    import bacalhau_spark.engine as eng_mod
    seq = iter(["manifest-a", "manifest-b"])
    monkeypatch.setattr(eng_mod, "result_manifest",
                        lambda _df, metrics_out=None: next(seq))
    out = tmp_path / "rejected_out"
    with pytest.raises(eng_mod.ResultsRejectedError):
        engine.submit(JobSpec(query="q01_scan_projection",
                              inputs={"sf_dir": SF_DIR}, replicas=2,
                              outputs={"path": str(out)}))
    (rid,) = list(engine.list_runs())
    assert engine.state(rid) == "ResultsRejected"
    assert not out.exists()


def test_unknown_query_rejected(engine):
    with pytest.raises(KeyError):
        engine.submit(JobSpec(query="nope"))


def test_spec_loader_json(tmp_path):
    doc = {"query": "q01_scan_projection", "replicas": 2, "verified": True,
           "inputs": {"sf_dir": SF_DIR}, "annotations": ["t1"]}
    p = tmp_path / "job.json"
    p.write_text(json.dumps(doc))
    spec = JobSpec.load(str(p))
    assert spec.query == "q01_scan_projection"
    assert spec.replicas == 2 and spec.verified
    with pytest.raises(ValueError):
        JobSpec.from_dict({"replicas": 1})


def test_output_sink(engine, tmp_path, spark):
    out = str(tmp_path / "out")
    engine.submit(JobSpec(query="q01_scan_projection",
                          inputs={"sf_dir": SF_DIR},
                          outputs={"path": out, "format": "parquet"}))
    back = spark.read.parquet(out)
    assert back.count() == 25


def test_events_and_states_df(engine):
    rid = engine.submit(JobSpec(query="q01_scan_projection",
                                inputs={"sf_dir": SF_DIR}))
    evts = engine.events_df().where(f"run_id = '{rid}'").collect()
    assert [e["name"] for e in sorted(evts, key=lambda e: e["ordinal"])][:3] \
        == ["Created", "Bid", "Running"]
    states = {r["run_id"]: r["state"] for r in engine.states_df().collect()}
    assert states[rid] == "Completed"


def test_policy_hooks(spark):
    """Submit-time selection policies — the JobSelectionPolicy analog:
    a declining policy rejects the job before any Spark work."""
    from bacalhau_spark.engine import Engine, JobRejectedError
    from bacalhau_spark import registry as reg

    def no_annotated_jobs(spec):
        return "blocked" not in spec.annotations

    eng = Engine(spark, reg.queries(), policies=[no_annotated_jobs])
    ok = eng.submit(JobSpec(query="q01_scan_projection",
                            inputs={"sf_dir": SF_DIR}))
    assert eng.state(ok) == "Completed"
    with pytest.raises(JobRejectedError):
        eng.submit(JobSpec(query="q01_scan_projection",
                           inputs={"sf_dir": SF_DIR},
                           annotations=["blocked"]))
    assert "Rejected" in {e.name for e in eng.events()}


def test_metrics_event_carries_execution_telemetry(engine):
    """Every run logs a Metrics event with real SQLMetrics from the executed
    plan (the per-job tracing analog): wall clock always; scan/result
    counters whenever the engine controls the execution."""
    rid = engine.submit(JobSpec(query="q01_scan_projection",
                                inputs={"sf_dir": SF_DIR}))
    (metrics_evt,) = [e for e in engine.events(rid) if e.name == "Metrics"]
    m = json.loads(metrics_evt.detail)
    assert m["wall_s"] >= 0
    assert m["result_rows"] == 25
    # >= 25: the global sort's range partitioner samples the scan before
    # shuffling, so the scan's row counter sees two passes
    assert m["scan_rows"] >= 25 and m["scan_bytes"] > 0
    # verified path: telemetry comes from the manifest execution
    rid2 = engine.submit(JobSpec(query="q13_join_agg",
                                 inputs={"sf_dir": SF_DIR},
                                 replicas=2, verified=True))
    (mevt2,) = [e for e in engine.events(rid2) if e.name == "Metrics"]
    m2 = json.loads(mevt2.detail)
    assert m2["result_rows"] == 25 and m2["scan_bytes"] > 0
    # and the run log exposes them as queryable rows
    assert engine.events_df().where("name = 'Metrics'").count() == 2


def test_context_shipped_module_runs_in_udf(spark, tmp_path):
    """Context-upload analog: a module that exists ONLY in the job's context
    dir must be importable inside a UDF executing on workers (the reference
    tars the CWD into the job and mounts it at /job)."""
    from bacalhau_spark.engine import Engine

    (tmp_path / "ctxmod.py").write_text("def triple(x):\n    return 3 * x\n")

    def ctx_query(spark_, sf_dir):
        from pyspark.sql.functions import pandas_udf
        from bacalhau_spark.catalog import table

        @pandas_udf("long")
        def triple_udf(s):
            import ctxmod
            return s.map(ctxmod.triple)

        return (table(spark_, sf_dir, "nation")
                .select(triple_udf(F.col("n_nationkey")).alias("t")))

    eng = Engine(spark, {"ctx": ctx_query})
    rid = eng.submit(JobSpec(query="ctx", inputs={"sf_dir": SF_DIR},
                             context=str(tmp_path)))
    assert eng.state(rid) == EVT_COMPLETED
    got = ctx_query(spark, SF_DIR).agg(F.sum("t").alias("s")).collect()[0]["s"]
    assert got == 3 * sum(range(25))


def test_context_archive_size_cap(tmp_path):
    from bacalhau_spark.engine import build_context_archive
    (tmp_path / "big.bin").write_bytes(b"x" * 4096)
    with pytest.raises(ValueError, match="max"):
        build_context_archive(str(tmp_path), max_bytes=1024)
    # identical content -> identical (content-addressed) archive path
    a1 = build_context_archive(str(tmp_path))
    a2 = build_context_archive(str(tmp_path))
    assert a1 == a2


def test_timeout_cancels_job_group(spark):
    """A run past its timeout_s must be cancelled (its job group killed)
    and surface JobTimeoutError + an Error event — the engine analog of the
    reference's per-operation timeouts (pkg/config/config.go:42-82)."""
    import time as _time

    from bacalhau_spark.engine import Engine, JobTimeoutError

    def slow(spark_, sf_dir):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def nap(s):
            import time
            time.sleep(30)
            return s

        return spark_.range(8, numPartitions=8).select(nap("id").alias("x"))

    eng = Engine(spark, {"slow": slow})
    t0 = _time.time()
    with pytest.raises(JobTimeoutError, match="timeout_s"):
        eng.submit(JobSpec(query="slow", timeout_s=2.0))
    assert _time.time() - t0 < 25  # cancelled, not run to completion
    (rid,) = list(eng.list_runs())
    assert eng.state(rid) == "Error"
    assert "JobTimeoutError" in eng.events(rid)[-1].detail


def test_timeout_spec_validation():
    """A JSON spec's string/negative timeout must fail at construction —
    a string is truthy but would break the watchdog thread silently."""
    for bad in ("60", -1, 0, True):
        with pytest.raises(ValueError, match="timeout_s"):
            JobSpec(query="q01_scan_projection", timeout_s=bad)
    assert JobSpec(query="q01_scan_projection", timeout_s=5).timeout_s == 5.0


def test_context_module_collision_rejected(spark, tmp_path):
    """Two jobs shipping DIFFERENT code under the same module name must not
    silently share the first archive (addPyFile has no un-register; import
    cache + sys.path precedence would pin version 1). The engine rejects
    the collision; re-shipping the identical context stays fine."""
    from bacalhau_spark.engine import Engine

    ctx1 = tmp_path / "c1"
    ctx1.mkdir()
    (ctx1 / "dupmod.py").write_text("VERSION = 1\n")
    ctx2 = tmp_path / "c2"
    ctx2.mkdir()
    (ctx2 / "dupmod.py").write_text("VERSION = 2\n")

    def noop(spark_, sf_dir):
        from bacalhau_spark.catalog import table
        return table(spark_, sf_dir, "region")

    eng = Engine(spark, {"noop": noop})
    first = eng.submit(JobSpec(query="noop", inputs={"sf_dir": SF_DIR},
                               context=str(ctx1)))
    assert eng.state(first) == EVT_COMPLETED
    # identical content re-ships cleanly (content-addressed: same archive)
    again = eng.submit(JobSpec(query="noop", inputs={"sf_dir": SF_DIR},
                               context=str(ctx1)))
    assert eng.state(again) == EVT_COMPLETED
    with pytest.raises(ValueError, match="collides"):
        eng.submit(JobSpec(query="noop", inputs={"sf_dir": SF_DIR},
                           context=str(ctx2)))


def test_error_event_recorded_on_failure(spark):
    """A failing job must emit Error (with the exception) and re-raise —
    the reference's ErrorJob path (`pkg/computenode/computenode.go:291-319`)."""
    from bacalhau_spark.engine import Engine

    def boom(_spark, _sf):
        raise RuntimeError("executor exploded")

    eng = Engine(spark, {"boom": boom})
    with pytest.raises(RuntimeError, match="executor exploded"):
        eng.submit(JobSpec(query="boom"))
    (rid,) = list(eng.list_runs())
    assert eng.state(rid) == "Error"
    assert "executor exploded" in eng.events(rid)[-1].detail
