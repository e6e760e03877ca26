"""Decompose the streaming lifecycle floor (r14 verdict #7): every
nd_stream_* row starts a fresh availableNow query (memory sink) and the
registry sweep shows ~0.7-1 s/row even for trivial projections. Where
does it go, and can configuration cut it without changing results?

Measures, each x5 in one session:
  1. batch floor: the 1-row scheduler probe (reference).
  2. minimal stateless stream: readStream(events) -> select -> memory
     sink append, availableNow. Per-run recentProgress durationMs
     breakdown (addBatch / walCommit / latestOffset / queryPlanning /
     commitOffsets) + batch count.
  3. minimal stateful stream: the tumbling-window aggregate (complete).
  4. variants on 3: state partitions 1 vs 4 (STREAM_STATE_PARTITIONS),
     checkpoint on /dev/shm (tmpfs) vs default /tmp.

Run: python experiments/stream_floor_r15.py
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from bacalhau_spark.session import get_session
    from bacalhau_spark.streaming import events as E

    spark = get_session("stream-floor-r15", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    trivial = spark.range(1).agg(F.sum("id").alias("s"))
    for _ in range(2):
        trivial.write.mode("overwrite").format("noop").save()
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        trivial.write.mode("overwrite").format("noop").save()
        floors.append(time.perf_counter() - t0)
    print(f"batch floor: median {statistics.median(floors):.3f}s")

    def run_stream(df, mode, name, ckpt=None, partitions=None):
        w = (df.writeStream.format("memory").queryName(name)
             .outputMode(mode).trigger(availableNow=True))
        if ckpt:
            w = w.option("checkpointLocation",
                         f"{ckpt}/{name}_{time.monotonic_ns()}")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        try:
            t0 = time.perf_counter()
            q = w.start()
            t_start = time.perf_counter() - t0
            q.awaitTermination(120)
            q.stop()
            total = time.perf_counter() - t0
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        prog = [json.loads(str(p)) for p in q.recentProgress]
        return t_start, total, prog

    def series(label, mk_df, mode, name, ckpt=None, partitions=None,
               n=5):
        starts, totals, progs = [], [], None
        for _ in range(n):
            s, t, p = run_stream(mk_df(), mode, name, ckpt, partitions)
            starts.append(s)
            totals.append(t)
            progs = p
        d = {}
        for p in progs:
            for k, v in p.get("durationMs", {}).items():
                d[k] = d.get(k, 0) + v
        print(f"{label}: total median {statistics.median(totals):.3f}s "
              f"(start {statistics.median(starts):.3f}s, "
              f"{len(progs)} batches; last-run durationMs {d})")
        return statistics.median(totals)

    stream = lambda: E._event_stream(spark, SF).select("event_id")  # noqa: E731
    series("stateless select (append)", stream, "append", "sf_min")

    agg = lambda: E.stream_tumbling_window(spark, SF)  # noqa: E731
    series("tumbling agg (complete), 4 parts", agg, "complete",
           "sf_agg4", partitions=4)
    series("tumbling agg (complete), 1 part", agg, "complete",
           "sf_agg1", partitions=1)
    series("tumbling agg (complete), 4 parts, tmpfs ckpt", agg,
           "complete", "sf_aggshm", ckpt="/dev/shm/bacalhau_ckpt",
           partitions=4)
    series("stateless select, tmpfs ckpt", stream, "append",
           "sf_minshm", ckpt="/dev/shm/bacalhau_ckpt")


if __name__ == "__main__":
    main()
