"""Round-12 read-path burst harness — the analog of the reference's
list-pressure benchmark (benchmark/quick_read.sh:3-7: `list --wide`
x1000, 100-way parallel, looped against one API) completing the burst
pair started by submit_throughput_r11.py (quick_submit.sh analog).

Protocol: populate a realistic run table (200 completed noop runs — the
state a list-under-load benchmark actually reads), then fire N GET
requests from P client threads over REAL HTTP (stdlib ThreadingHTTPServer
on one side, urllib on the other — the same wire the CLI uses) against:

  (a) /list on one Engine's ApiServer — the `list --wide` analog (the
      full {run_id: state} table per request);
  (b) /states?run_id=X on the same server — the poll verb every
      async-submit client hammers while waiting;
  (c) /list round-robin across a 3-node DevStack's per-node APIs — the
      federation read surface.

Reported per plane: requests/sec, wall seconds, error count, and p50/p99
client-observed latency. The reference loops the burst once a second
forever (soak); here each plane runs ROUNDS consecutive bursts and
reports each — a flat series IS the soak signal at this duration. Run:
    python experiments/read_burst_r12.py [--n 1000] [--threads 100]
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
ROUNDS = 3


def _burst(call, n: int, threads: int) -> dict:
    lat: list[float] = []
    errors = 0

    def one(i):
        t0 = time.perf_counter()
        try:
            call(i)
            return time.perf_counter() - t0, 0
        except Exception:  # noqa: BLE001 — an error IS the measurement
            return time.perf_counter() - t0, 1

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        for dt, err in pool.map(one, range(n)):
            lat.append(dt)
            errors += err
    wall = time.perf_counter() - t0
    lat.sort()
    return {
        "n": n, "threads": threads,
        "wall_s": round(wall, 2),
        "reqs_per_s": round(n / wall, 1),
        "errors": errors,
        "p50_ms": round(lat[len(lat) // 2] * 1000, 1),
        "p99_ms": round(lat[int(len(lat) * 0.99)] * 1000, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--threads", type=int, default=100)
    ap.add_argument("--runs", type=int, default=200,
                    help="completed runs populating the listed table")
    args = ap.parse_args()

    from bacalhau_spark.api import ApiClient, ApiServer
    from bacalhau_spark.devstack import DevStack
    from bacalhau_spark.engine import Engine, JobSpec
    from bacalhau_spark.registry import queries
    from bacalhau_spark.session import get_session

    spark = get_session("read-burst-r12")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**queries(), "noop": lambda s, _sf: s.range(1)}

    def populate(submit, wait) -> list[str]:
        """Submit with the r11 harness's client-side backpressure: a full
        bounded backlog is the admission gate working, so retry."""
        from bacalhau_spark.capacity import BacklogFullError
        from bacalhau_spark.engine import JobRejectedError

        handles = []
        for _ in range(args.runs):
            while True:
                try:
                    handles.append(
                        submit(JobSpec(query="noop",
                                       inputs={"sf_dir": SF_DIR})))
                    break
                except (BacklogFullError, JobRejectedError) as exc:
                    if "backlog" not in str(exc):
                        raise
                    time.sleep(0.02)
        for h in handles:
            wait(h)
        return handles

    # (a)+(b) single engine behind one ApiServer
    eng = Engine(spark, registry)
    rids = populate(eng.submit_async, lambda r: eng.wait(r, timeout=600))
    srv = ApiServer(eng, port=0).start_background()
    client = ApiClient(srv.url, timeout=60)
    single_list = [_burst(lambda _i: client.list_runs(),
                          args.n, args.threads) for _ in range(ROUNDS)]
    single_states = [_burst(
        lambda i: client.states(rids[i % len(rids)]),
        args.n, args.threads) for _ in range(ROUNDS)]
    srv.shutdown()

    # (c) 3-node devstack, per-node APIs, round-robin list
    stack = DevStack(spark, registry, n_nodes=3, start_api=True)
    handles = populate(
        lambda spec: stack.submit_async(spec),
        lambda h: stack.nodes[h[0]].wait(h[1], timeout=600))
    del handles
    clients = [ApiClient(s.url, timeout=60) for s in stack.servers]
    dev_list = [_burst(lambda i: clients[i % 3].list_runs(),
                       args.n, args.threads) for _ in range(ROUNDS)]
    for s in stack.servers:
        s.shutdown()

    print(json.dumps({
        "sf_dir": SF_DIR, "populated_runs": args.runs,
        "single_list": single_list,
        "single_states": single_states,
        "devstack_3node_list": dev_list,
        "protocol": "quick_read.sh:3-7 analog (x1000 list, 100-way)",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
