"""Round-13 read-burst re-measurement after the /list response cache
(rendered once per engine state REVISION, ETag/304 for conditional
polls) — the follow-up the round-12 artifact's closing note asked for:
the r12 fix removed the structural quadratic; this round removes the
per-request json.dumps from the burst verb and measures what is left of
the single-process ceiling.

Planes (protocol identical to read_burst_r12.py — 200 completed runs,
N requests from P client threads over real HTTP, ROUNDS consecutive
bursts):
  (a) /list full-body GETs      — the `list --wide` analog
  (b) /list conditional GETs    — every request sends If-None-Match
                                  with the live ETag (the poll loop a
                                  well-behaved client actually runs);
                                  304s dominate
  (c) /states?run_id=X          — the per-run poll verb (uncached,
                                  the control)
Run: python experiments/read_burst_r13.py [--n 1000] [--threads 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.read_burst_r12 import SF_DIR, _burst

ROUNDS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--threads", type=int, default=100)
    ap.add_argument("--runs", type=int, default=200)
    args = ap.parse_args()

    from urllib import request as urlrequest
    from urllib.error import HTTPError

    from bacalhau_spark.api import ApiClient, ApiServer
    from bacalhau_spark.capacity import BacklogFullError
    from bacalhau_spark.engine import Engine, JobRejectedError, JobSpec
    from bacalhau_spark.registry import queries
    from bacalhau_spark.session import get_session

    spark = get_session("read-burst-r13")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**queries(), "noop": lambda s, _sf: s.range(1)}
    eng = Engine(spark, registry)
    rids = []
    for _ in range(args.runs):
        while True:
            try:
                rids.append(eng.submit_async(
                    JobSpec(query="noop", inputs={"sf_dir": SF_DIR})))
                break
            except (BacklogFullError, JobRejectedError) as exc:
                if "backlog" not in str(exc):
                    raise
                time.sleep(0.02)
    for r in rids:
        eng.wait(r, timeout=600)

    srv = ApiServer(eng, port=0).start_background()
    client = ApiClient(srv.url, timeout=60)

    out = {"sf_dir": SF_DIR, "populated_runs": args.runs}
    out["list_full"] = [_burst(lambda _i: client.list_runs(),
                               args.n, args.threads)
                        for _ in range(ROUNDS)]

    with urlrequest.urlopen(srv.url + "/list") as resp:
        etag = resp.headers.get("ETag")

    def conditional(_i):
        req = urlrequest.Request(srv.url + "/list")
        req.add_header("If-None-Match", etag)
        try:
            with urlrequest.urlopen(req) as resp:
                resp.read()
        except HTTPError as e:
            if e.code != 304:
                raise
    out["list_conditional_304"] = [_burst(conditional, args.n,
                                          args.threads)
                                   for _ in range(ROUNDS)]
    out["states"] = [_burst(lambda i: client.states(rids[i % len(rids)]),
                            args.n, args.threads) for _ in range(ROUNDS)]
    srv.shutdown()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
