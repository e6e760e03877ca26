"""Round-11 control-plane throughput harness — the analog of the
reference's burst benchmark (benchmark/quick_submit.sh:3-6: 1000 noop
docker submissions, 100-way parallel, against one node) and its roadmap
target (ROADMAP.md:12-14: >= 99% of 10k jobs complete).

Two planes, same protocol (N noop submissions from P submitter threads,
then wait for all):

  (a) Engine.submit_async on one node — submissions/sec is the pure
      control-plane rate (admission gate + event log + executor
      hand-off; the job body is spark.range(1), the /bin/true analog).
  (b) a 3-node DevStack — the federation router (first-bidder placement,
      overflow to least-backlogged) in front of the same machinery.

Reported: submit-side rate (how fast the gate ACCEPTS work — what
quick_submit.sh exercises), end-to-end rate (accepted -> completed), and
the completion ratio against the >= 99% roadmap bar. Run:
    python experiments/submit_throughput_r11.py [--n 1000] [--threads 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _burst(submit, wait, n: int, threads: int) -> dict:
    """Submit with client-side backpressure: a full backlog is the
    admission gate WORKING (bounded FIFO, the reference's capacity
    semantics), so the client retries after a short sleep — the same
    effective behavior as quick_submit.sh's xargs -P pool blocking on
    slow CLI invocations."""
    from bacalhau_spark.capacity import BacklogFullError
    from bacalhau_spark.engine import JobRejectedError

    def submit_with_backpressure(i):
        while True:
            try:
                return submit(i)
            except (BacklogFullError, JobRejectedError) as exc:
                if "backlog" not in str(exc):
                    raise
                time.sleep(0.02)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        handles = list(pool.map(submit_with_backpressure, range(n)))
    submit_s = time.perf_counter() - t0
    ok = 0
    for h in handles:
        try:
            ok += 1 if wait(h) == "Completed" else 0
        except Exception:
            pass
    total_s = time.perf_counter() - t0
    return {
        "n": n, "threads": threads,
        "submit_s": round(submit_s, 2),
        "submits_per_s": round(n / submit_s, 1),
        "end_to_end_s": round(total_s, 2),
        "jobs_per_s": round(n / total_s, 1),
        "completed": ok,
        "completion_ratio": round(ok / n, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--threads", type=int, default=100)
    args = ap.parse_args()

    from bacalhau_spark.devstack import DevStack
    from bacalhau_spark.engine import Engine, JobSpec
    from bacalhau_spark.registry import queries
    from bacalhau_spark.session import get_session

    spark = get_session("submit-throughput-r11")
    spark.sparkContext.setLogLevel("ERROR")
    # the /bin/true analog: a one-row jobbody so the measurement is the
    # control plane, not query execution
    registry = {**queries(), "noop": lambda s, _sf: s.range(1)}

    def spec(_i: int) -> JobSpec:
        return JobSpec(query="noop", inputs={"sf_dir": SF_DIR})

    eng = Engine(spark, registry)
    single = _burst(lambda i: eng.submit_async(spec(i)),
                    lambda rid: eng.wait(rid, timeout=600),
                    args.n, args.threads)

    stack = DevStack(spark, registry, n_nodes=3)
    dev = _burst(lambda i: stack.submit_async(spec(i)),
                 lambda h: stack.nodes[h[0]].wait(h[1], timeout=600),
                 args.n, args.threads)

    print(json.dumps({"sf_dir": SF_DIR,
                      "single_engine": single, "devstack_3node": dev,
                      "roadmap_target": ">=0.99 completion",
                      "meets_target": (single["completion_ratio"] >= 0.99
                                       and dev["completion_ratio"] >= 0.99)}))
    spark.stop()


if __name__ == "__main__":
    main()
