"""Capacity/admission tests — the reference's capacitymanager semantics
(`pkg/capacitymanager/capacitymanager_test.go` analog): bounded FIFO
backlog, bid-when-free admission, queued → running → complete ordering, and
rejection at the bound; plus the engine/API async-submit surface built on
top of it.
"""

from __future__ import annotations

import threading
import time

import pytest

from bacalhau_spark.capacity import (BacklogFullError, CapacityManager,
                                     NeverFitsError, ResourceUsage)
from bacalhau_spark.engine import (EVT_BID, EVT_COMPLETED, EVT_CREATED,
                                   EVT_RUNNING, Engine, JobRejectedError,
                                   JobSpec)
from bacalhau_spark.registry import queries

from tests.conftest import SF_DIR


# -- pure CapacityManager ---------------------------------------------------

def test_fifo_admission_within_capacity():
    cm = CapacityManager(total=ResourceUsage(cpu=2.0), max_backlog=10)
    cm.enqueue("a", ResourceUsage(cpu=1.0))
    cm.enqueue("b", ResourceUsage(cpu=1.0))
    cm.enqueue("c", ResourceUsage(cpu=1.0))
    assert cm.admit_next() == ["a", "b"]   # c does not fit yet
    assert cm.queue_position("c") == 0
    cm.release("a")
    assert cm.admit_next() == ["c"]
    assert cm.backlog_len() == 0
    assert sorted(cm.active_ids()) == ["b", "c"]


def test_smaller_job_overtakes_blocked_head():
    """GetNextItems walks FIFO order but skips items that don't fit —
    a small job behind a too-big head is not head-of-line blocked."""
    cm = CapacityManager(total=ResourceUsage(cpu=4.0), max_backlog=10)
    cm.enqueue("big", ResourceUsage(cpu=3.0))
    assert cm.admit_next() == ["big"]          # free: 1 core
    cm.enqueue("wide", ResourceUsage(cpu=2.0))  # blocked head
    cm.enqueue("small", ResourceUsage(cpu=1.0))
    assert cm.admit_next() == ["small"]        # overtakes the blocked head
    assert cm.queue_position("wide") == 0
    cm.release("big")
    assert cm.admit_next() == ["wide"]


def test_backlog_bound_rejects():
    cm = CapacityManager(total=ResourceUsage(cpu=1.0), max_backlog=2)
    cm.enqueue("a", ResourceUsage(cpu=1.0))
    cm.enqueue("b", ResourceUsage(cpu=1.0))
    with pytest.raises(BacklogFullError):
        cm.enqueue("c", ResourceUsage(cpu=1.0))


def test_never_fits_rejects_upfront():
    cm = CapacityManager(total=ResourceUsage(cpu=2.0, memory=1 << 30))
    with pytest.raises(NeverFitsError):
        cm.enqueue("x", ResourceUsage(cpu=3.0))
    with pytest.raises(NeverFitsError):
        cm.enqueue("y", ResourceUsage(cpu=1.0, memory=2 << 30))


def test_default_job_size_bounds_zero_spec_jobs():
    cm = CapacityManager(total=ResourceUsage(cpu=2.0))
    req = cm.requirements({})
    assert req.cpu > 0  # zero-request jobs still occupy a slot


# -- Engine integration -----------------------------------------------------

@pytest.fixture()
def small_engine(spark):
    """Engine admitting ONE default job at a time, backlog of 2."""
    cm = CapacityManager(total=ResourceUsage(cpu=1.0), max_backlog=2)
    return Engine(spark, queries(), capacity=cm)


def test_queued_then_running_then_complete(small_engine):
    """Two concurrent submits on a 1-slot engine: the second is backlogged
    (state stays Created) until the first completes, then runs — the
    queued → running → complete ordering."""
    eng = small_engine
    gate = threading.Event()
    base = queries()["q01_scan_projection"]

    def slow_query(spark, sf_dir):
        gate.wait(30)
        return base(spark, sf_dir)

    eng.registry["slow_q01"] = slow_query
    first = eng.submit_async(JobSpec(query="slow_q01",
                                     inputs={"sf_dir": SF_DIR}))
    second = eng.submit_async(JobSpec(query="q01_scan_projection",
                                      inputs={"sf_dir": SF_DIR}))
    # second must be backlogged while first holds the only slot
    assert eng.capacity.queue_position(second) == 0
    assert eng.state(second) == EVT_CREATED
    gate.set()
    eng.wait(first, timeout=60)
    eng.wait(second, timeout=60)
    assert eng.state(first) == EVT_COMPLETED
    assert eng.state(second) == EVT_COMPLETED
    names = [e.name for e in eng.events(second)]
    assert names[:3] == [EVT_CREATED, EVT_BID, EVT_RUNNING]
    # the second run's admission (Bid) happened only after the first
    # completed — FIFO through the capacity gate
    bid2 = next(e.ts for e in eng.events(second) if e.name == EVT_BID)
    done1 = next(e.ts for e in eng.events(first)
                 if e.name == EVT_COMPLETED)
    assert bid2 >= done1


def test_backlog_full_is_rejected(small_engine):
    eng = small_engine
    gate = threading.Event()
    base = queries()["q01_scan_projection"]

    def slow_query(spark, sf_dir):
        gate.wait(30)
        return base(spark, sf_dir)

    eng.registry["slow_q01"] = slow_query
    running = eng.submit_async(JobSpec(query="slow_q01",
                                       inputs={"sf_dir": SF_DIR}))
    queued = [eng.submit_async(JobSpec(query="q01_scan_projection",
                                       inputs={"sf_dir": SF_DIR}))
              for _ in range(2)]  # fills max_backlog=2
    with pytest.raises(JobRejectedError, match="backlog full"):
        eng.submit_async(JobSpec(query="q01_scan_projection",
                                 inputs={"sf_dir": SF_DIR}))
    gate.set()
    for rid in [running, *queued]:
        eng.wait(rid, timeout=60)
        assert eng.state(rid) == EVT_COMPLETED


def test_impossible_resources_rejected(small_engine):
    with pytest.raises(JobRejectedError, match="exceeds total capacity"):
        small_engine.submit_async(
            JobSpec(query="q01_scan_projection",
                    inputs={"sf_dir": SF_DIR},
                    resources={"cpu": "64"}))


def test_concurrent_submits_all_complete(spark):
    """A burst above the concurrency limit drains fully through the gate."""
    cm = CapacityManager(total=ResourceUsage(cpu=2.0), max_backlog=16)
    eng = Engine(spark, queries(), capacity=cm)
    rids = [eng.submit_async(JobSpec(query="q01_scan_projection",
                                     inputs={"sf_dir": SF_DIR}))
            for _ in range(5)]
    deadline = time.time() + 120
    for rid in rids:
        eng.wait(rid, timeout=max(1.0, deadline - time.time()))
        assert eng.state(rid) == EVT_COMPLETED
