"""Interleaved A/B of the tmpfs ephemeral-checkpoint change (r15) on
three registered streaming rows, toggling the module base in-process:
A = /dev/shm (the new default), B = None (Spark's temp-dir behavior,
the r14 path). Also asserts the checkpoint dirs are cleaned up.

Run: python experiments/stream_ckpt_r15.py
"""
from __future__ import annotations

import glob
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = ("nd_stream_tumbling", "nd_stream_band_screen",
        "nd_stream_stateful")


def main():
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session
    from bacalhau_spark.streaming import events as E

    spark = get_session("stream-ckpt-r15", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        for _ in range(3):  # warm past the JIT ramp (first A/B showed
            noop(fn(spark, SF))  # a declining transient across pairs)
        a_runs, b_runs = [], []
        for i in range(6):
            # alternate which arm runs first within each pair so any
            # residual ramp/load drift splits evenly
            order = ("/dev/shm", None) if i % 2 == 0 else (None, "/dev/shm")
            for base in order:
                E._STREAM_CKPT_BASE = base
                t0 = time.perf_counter()
                noop(fn(spark, SF))
                dt = time.perf_counter() - t0
                (a_runs if base else b_runs).append(dt)
        E._STREAM_CKPT_BASE = "/dev/shm"
        print(f"{name}: A tmpfs {statistics.median(a_runs):.3f}s "
              f"{[round(t, 2) for t in a_runs]} | "
              f"B tempdir {statistics.median(b_runs):.3f}s "
              f"{[round(t, 2) for t in b_runs]}")
    left = glob.glob("/dev/shm/bacalhau-stream-ckpt-*")
    print(f"leftover tmpfs checkpoint dirs: {len(left)}")
    assert not left, left


if __name__ == "__main__":
    main()
