"""Devstack: an N-node control plane in one process, for integration tests.

The reference's `bacalhau devstack` boots 3 in-process nodes (own
transport, controller, executors, API server each) and prints the env
exports a shell needs to talk to node 0 (`cmd/bacalhau/devstack.go`,
`pkg/devstack/devstack.go:54-258`). The Spark restatement keeps what the
verb is FOR — exercising multi-node scheduling semantics without a real
cluster — and collapses what Spark makes redundant (libp2p transport,
per-node executors): N `Engine`s share ONE SparkSession (the data plane
is Spark either way), but each node keeps its OWN capacity manager,
backlog, event log, and API server, so admission, bidding, and overflow
behave exactly as N separate nodes would.

Routing is the reference's first-bidder rule (`pkg/computenode/
computenode.go:141-187`: a node bids when the job fits its free
capacity): `DevStack.submit` offers the spec to each node in order and
the first with free room takes it; if none has free capacity now, the
least-backlogged node queues it (jobs never vanish); per-node
BacklogFullError falls through to the next node, and only when EVERY
node rejects does the submit fail — the federation-level reject.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession

from bacalhau_spark.capacity import (BacklogFullError, CapacityManager,
                                     NeverFitsError, detect_total)
from bacalhau_spark.engine import (EVT_BID, EVT_CREATED, EVT_METRICS,
                                   EVT_RESULTS_REJECTED, EVT_RUNNING,
                                   Engine, JobRejectedError, JobSpec,
                                   ResultsRejectedError)


class BadActorEngine(Engine):
    """A dishonest devstack node: it takes jobs, RUNS them for real, then
    publishes a corrupted result digest — the reference devstack's
    bad-actor count (`pkg/devstack/devstack.go:54-258`, exercised by the
    harness's `test-badactors` target, `Makefile:149-153`). The
    corruption is deterministic and salted per node, so the node is
    internally self-consistent (its own replica comparison passes — a
    liar tells the same lie twice) and two bad actors do not accidentally
    corroborate each other; only federation-level manifest comparison
    across nodes can catch it."""

    def __init__(self, *args, salt: str = "", **kwargs):
        super().__init__(*args, **kwargs)
        self._bad_salt = salt

    def _result_manifest(self, df, metrics_out: dict | None = None) -> str:
        honest = super()._result_manifest(df, metrics_out=metrics_out)
        return "bad-" + hashlib.md5(
            f"{honest}:{self._bad_salt}".encode()).hexdigest()


class DevStack:
    """N logical nodes over one SparkSession. `start_api=True` also binds
    one ApiServer per node on ephemeral ports (the devstack printout).
    `bad_actors=K` makes the LAST K nodes dishonest (BadActorEngine) —
    the reference devstack's badActors argument."""

    def __init__(self, spark: SparkSession, registry,
                 n_nodes: int = 3, start_api: bool = False,
                 bad_actors: int = 0):
        if n_nodes < 1:
            raise ValueError("devstack needs at least one node")
        if not 0 <= bad_actors <= n_nodes:
            raise ValueError("bad_actors must be within [0, n_nodes]")
        total = detect_total(cpus=spark.sparkContext.defaultParallelism)
        # Each node owns an equal slice of the machine — the devstack
        # shape where N nodes share one box's resources.
        from bacalhau_spark.capacity import ResourceUsage
        slice_ = ResourceUsage(cpu=max(1.0, total.cpu / n_nodes),
                               memory=total.memory // n_nodes,
                               disk=total.disk // n_nodes,
                               gpu=total.gpu // n_nodes)
        self.nodes = []
        for i in range(n_nodes):
            cap = CapacityManager(total=slice_)
            if i >= n_nodes - bad_actors:
                self.nodes.append(BadActorEngine(
                    spark, dict(registry), capacity=cap, salt=f"node{i}"))
            else:
                self.nodes.append(Engine(spark, dict(registry),
                                         capacity=cap))
        self.servers = []
        if start_api:
            from bacalhau_spark.api import ApiServer
            self.servers = [ApiServer(n, port=0).start_background()
                            for n in self.nodes]
        # nodes taken out by fail_node: skipped by every placement; the
        # reroute audit maps each displaced run to its new home.
        self.down: set[int] = set()
        self.reroutes: dict[str, str] = {}

    # -- scheduling ---------------------------------------------------------
    def _placement_order(self, spec: JobSpec) -> list[int]:
        """THE node ordering every stack submit uses: nodes whose FREE
        capacity fits the request first (first-bidder, node order), then
        the remainder by ascending backlog. Factored so single and
        replicated placement cannot drift under future policy changes —
        each caller offers each node AT MOST once (a failed
        Engine.submit_async mints a run_id + Rejected event, so retrying
        a node would leave duplicate Rejected entries)."""
        fitting, rest = [], []
        for i, node in enumerate(self.nodes):
            if i in self.down:
                continue
            req = node.capacity.requirements(spec.resources)
            (fitting if req.fits_in(node.capacity.free())
             else rest).append(i)
        rest.sort(key=lambda i: self.nodes[i].capacity.backlog_len())
        return fitting + rest

    def submit_async(self, spec: JobSpec) -> tuple[int, str]:
        """Route to the first node whose FREE capacity fits the request
        (first-bidder); otherwise queue on the least-backlogged node.
        Returns (node_index, run_id). Raises JobRejectedError only when
        every node rejects (too big for any node / all backlogs full)."""
        last_err: Exception | None = None
        for i in self._placement_order(spec):
            try:
                return i, self.nodes[i].submit_async(spec)
            except (JobRejectedError, BacklogFullError,
                    NeverFitsError) as exc:
                last_err = exc
        raise JobRejectedError(
            f"no devstack node accepted the job: {last_err!r}")

    def submit(self, spec: JobSpec) -> tuple[int, str]:
        i, run_id = self.submit_async(spec)
        self.nodes[i].wait(run_id)
        return i, run_id

    def submit_replicated(self, spec: JobSpec,
                          concurrency: int = 3) -> dict:
        """Deal.Concurrency ACROSS NODES: run the same verified spec on
        `concurrency` distinct nodes, compare their published manifests
        federation-wide, accept the strict-majority manifest, and
        quarantine every dissenting run with a ResultsRejected event —
        the requester-side verification loop the reference's bad-actor
        devstack exercises (`pkg/devstack/devstack.go:54-258`,
        `Makefile:149-153` test-badactors). No strict majority ⇒ the
        whole job is rejected on every node (an unverifiable result is
        not a result).

        Quarantine composes with the rest of the plane for free: the
        ResultsRejected event is the run's new max-ordinal state, so
        fetch_results refuses the run and the within-node reuse cache's
        TERMINAL_OK_STATES check stops serving it.

        The spec must be `verified` (manifests are the comparable result
        identity) and must not declare an output path — the nodes share
        one filesystem here, so N replicas would clobber one sink; the
        accepted manifest is the result identity, and a follow-up
        normal submit materializes it (reuse serves honest runs only).
        """
        if not 2 <= concurrency <= len(self.nodes):
            raise ValueError(
                f"concurrency must be in [2, {len(self.nodes)}]")
        if not spec.verified:
            raise ValueError("replicated submit requires a verified spec "
                             "(manifests are the compared result identity)")
        if spec.outputs.get("path"):
            raise ValueError("replicated specs must not declare an output "
                             "path: N nodes sharing one filesystem would "
                             "clobber a single sink")
        # Distinct-node placement: the shared _placement_order, but never
        # the same node twice (a replica on the liar's own second slot
        # proves nothing).
        handles: list[tuple[int, str]] = []
        last_err: Exception | None = None
        for i in self._placement_order(spec):
            if len(handles) == concurrency:
                break
            try:
                handles.append((i, self.nodes[i].submit_async(spec)))
            except (JobRejectedError, BacklogFullError,
                    NeverFitsError) as exc:
                last_err = exc
        if len(handles) < concurrency:
            raise JobRejectedError(
                f"only {len(handles)}/{concurrency} nodes accepted the "
                f"replicated job: {last_err!r}")
        for i, rid in handles:
            self.nodes[i].wait(rid)
        manifests = {(i, rid): self.nodes[i].describe(rid)["manifest"]
                     for i, rid in handles}
        from collections import Counter
        top, votes = Counter(manifests.values()).most_common(1)[0]
        if votes <= concurrency // 2:
            for (i, rid), m in manifests.items():
                self.nodes[i]._emit(
                    rid, EVT_RESULTS_REJECTED,
                    f"federation verification: no strict majority among "
                    f"{concurrency} replicas")
            raise ResultsRejectedError(
                f"replicated job has no strict-majority manifest among "
                f"{concurrency} nodes: {sorted(set(manifests.values()))}")
        accepted, rejected = [], []
        for (i, rid), m in manifests.items():
            if m == top:
                accepted.append((i, rid))
            else:
                self.nodes[i]._emit(
                    rid, EVT_RESULTS_REJECTED,
                    f"federation verification: manifest {m[:20]}… "
                    f"disagrees with the {votes}/{concurrency} majority")
                rejected.append((i, rid))
        return {"manifest": top, "accepted": accepted,
                "rejected": rejected}

    def submit_pipeline(self, stages: list[dict]) -> dict[str, str]:
        """Run a DAG of jobs ACROSS the stack: each stage routes through
        the first-bidder scheduler when its wave submits, so sibling
        stages land on different nodes and run concurrently, while
        '@parent' hand-offs cross nodes through the shared filesystem
        (one machine — the devstack premise). Statuses render as
        'node<i>:<run_id>'."""
        from bacalhau_spark.engine import run_pipeline_dag
        return run_pipeline_dag(
            stages,
            submit_async=self.submit_async,
            wait=lambda h: self.nodes[h[0]].wait(h[1]),
            effective_output=lambda h, declared:
                self.nodes[h[0]]._specs[h[1]].outputs.get("path")
                or declared,
            handle_str=lambda h: f"node{h[0]}:{h[1]}",
        )

    # -- node failure -------------------------------------------------------
    def fail_node(self, i: int) -> dict[str, str]:
        """Take node `i` out of the stack — the devstack form of a
        compute node dropping off the network (the reference requester's
        view: bids stop coming, in-flight work on that node is lost).
        Requester-side recovery, in order:

        1. the node is marked DOWN: `_placement_order` skips it, so no
           future submit/replica/pipeline stage ever offers it work;
        2. every non-terminal run on the node (queued-or-running:
           Created/Bid/Running/Metrics) is cancelled there — the event
           log keeps the full history, Cancelled with the node-down
           detail as its terminal state — and its SPEC is resubmitted
           through the normal first-bidder scheduler onto the surviving
           nodes (fresh run_id; the stack-level `reroutes` audit maps
           old → 'node<j>:<new_id>'). Deterministic overwrite sinks and
           the content-addressed result-reuse cache make the retry safe
           and cheap respectively;
        3. a displaced run no surviving node can hold maps to
           'unplaced' — lost capacity is surfaced, never silently
           dropped.

        Terminal runs are left untouched: their results (and the shared
        event log) live in the stack's single process, the devstack
        premise. Returns this call's {old_run_id: new_home} map."""
        if not 0 <= i < len(self.nodes):
            raise ValueError(f"no such node {i}")
        if i in self.down:
            return {}
        if len(self.down) + 1 >= len(self.nodes):
            raise RuntimeError("cannot fail the last live node")
        self.down.add(i)
        node = self.nodes[i]
        moved: dict[str, str] = {}
        for rid, st in node.list_runs().items():
            if st not in (EVT_CREATED, EVT_BID, EVT_RUNNING, EVT_METRICS):
                continue
            spec = node._specs[rid]
            node._emit(rid, EVT_METRICS, f"node{i} down; rerouting")
            node.cancel(rid)
            try:
                nj, nrid = self.submit_async(spec)
                moved[rid] = f"node{nj}:{nrid}"
            except (JobRejectedError, BacklogFullError,
                    NeverFitsError):
                moved[rid] = "unplaced"
        self.reroutes.update(moved)
        return moved

    # -- views --------------------------------------------------------------
    def list_runs(self) -> dict[str, tuple[int, str]]:
        """{run_id: (node_index, state)} across every node."""
        out: dict[str, tuple[int, str]] = {}
        for i, node in enumerate(self.nodes):
            for rid, st in node.list_runs().items():
                out[rid] = (i, st)
        return out

    def env_exports(self) -> list[str]:
        """The devstack printout (`cmd/bacalhau/devstack.go` prints the
        node-0 API host/port exports)."""
        return [f"export BACALHAU_SPARK_API_{i}={s.url}"
                for i, s in enumerate(self.servers)]

    def shutdown(self) -> None:
        for s in self.servers:
            s.shutdown()
