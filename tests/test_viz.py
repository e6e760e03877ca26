"""Cluster visualizer (viz.py) — the reference viz/ tool's behavior
against a real devstack: poll over a port range, fold to nodes+links,
serve /api/map and the dashboard page, age out dead nodes."""

from __future__ import annotations

import json
import urllib.request

from bacalhau_spark.devstack import DevStack
from bacalhau_spark.registry import queries
from bacalhau_spark.viz import MISS_LIMIT, VizServer, build_map


def _specs_for(stack):
    """Per-node (addr, start, end) ranges, each widened by one port so
    every sweep also probes unreachable ports — which must be skipped
    silently (viz/main.go:97-101). Ephemeral devstack ports are sparse
    across the 30-60k range, so a single covering range would scan tens
    of thousands of dead ports per sweep; production usage passes the
    contiguous range the deployment actually allocated (viz/README.md),
    and these per-node ranges model that."""
    return [("127.0.0.1", p, p + 1) for p in
            sorted(int(s.url.rsplit(":", 1)[1]) for s in stack.servers)]


def test_viz_maps_devstack_topology(spark):
    stack = DevStack(spark, queries(), n_nodes=3, start_api=True)
    try:
        viz = VizServer(_specs_for(stack), interval=30.0)
        try:
            m = viz.poll_once()
            assert len(m["nodes"]) == 3
            # single-driver stack: all nodes share the app id, and the
            # map stars every non-hub node onto the hub
            apps = {n["app"] for n in m["nodes"]}
            assert len(apps) == 1
            assert len(m["links"]) == 2
            hub = min(n["id"] for n in m["nodes"])
            assert all(li["target"] == hub for li in m["links"])
            # capacity folded in from /varz
            for n in m["nodes"]:
                assert n["capacity"]["total_cpu"] > 0
                assert n["capacity"]["backlog"] == 0
            # the HTTP surface: /api/map serves the same document,
            # / serves the dashboard page
            viz.start_background()
            with urllib.request.urlopen(viz.url + "/api/map",
                                        timeout=5) as r:
                served = json.loads(r.read().decode())
            assert {n["id"] for n in served["nodes"]} == \
                {n["id"] for n in m["nodes"]}
            with urllib.request.urlopen(viz.url + "/", timeout=5) as r:
                page = r.read().decode()
            assert "api/map" in page
        finally:
            viz.shutdown()
    finally:
        stack.shutdown()


def test_viz_ages_out_dead_nodes(spark):
    stack = DevStack(spark, queries(), n_nodes=2, start_api=True)
    viz = VizServer(_specs_for(stack), interval=30.0)
    try:
        assert len(viz.poll_once()["nodes"]) == 2
        stack.servers[1].shutdown()
        # below MISS_LIMIT consecutive misses the node lingers ...
        for _ in range(MISS_LIMIT - 1):
            m = viz.poll_once()
            assert len(m["nodes"]) == 2
        # ... at the limit it ages out
        assert len(viz.poll_once()["nodes"]) == 1
    finally:
        viz.shutdown()
        stack.shutdown()


def test_build_map_uses_reported_peers_when_present():
    """A node that DOES report peers (multi-driver future) keeps its
    reported edges verbatim instead of the star fallback."""
    states = {
        "u1": {"id": "a", "app": "app1", "peers": ["b"],
               "capacity": {}},
        "u2": {"id": "b", "app": "app1", "peers": [],
               "capacity": {}},
    }
    m = build_map(states)
    assert {(li["source"], li["target"]) for li in m["links"]} == \
        {("a", "b"), ("b", "a")}
