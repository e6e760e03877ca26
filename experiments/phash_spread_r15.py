"""Interleaved A/B (r15): spread_compute on the phash index hash builds.
The per-doc hash frames (image 72 / audio 144 / video 288 md5 cells per
doc) were built over the raw one-row-group documents scan — a single
task at any core count (the x10 scaling probe measured video's cold
path ~flat 8c vs 32c). A = spread (repartition to defaultParallelism
before the projection), B = raw scan. Pure per-row maps, so outputs are
identical up to row order.

Run: python experiments/phash_spread_r15.py [sf_dir]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from bacalhau_spark.catalog import spread_compute, table
    from bacalhau_spark.operators import multimodal as M
    from bacalhau_spark.session import get_session

    spark = get_session("phash-spread-r15", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    docs = table(spark, SF, "documents").select("doc_id")
    for label, frame in (("image", M.phash_frame),
                         ("audio", M.audio_phash_frame),
                         ("video", M.video_phash_frame)):
        noop(frame(docs))  # warm codegen for both shapes
        noop(frame(spread_compute(spark, docs, "doc_id")))
        a, b = [], []
        for i in range(6):
            arms = ((a, True), (b, False)) if i % 2 == 0 \
                else ((b, False), (a, True))
            for runs, spread in arms:
                src = (spread_compute(spark, docs, "doc_id")
                       if spread else docs)
                t0 = time.perf_counter()
                noop(frame(src))
                runs.append(time.perf_counter() - t0)
        print(f"{label}: A spread {statistics.median(a):.2f}s "
              f"{[round(t, 2) for t in a]} | B raw "
              f"{statistics.median(b):.2f}s {[round(t, 2) for t in b]}")


if __name__ == "__main__":
    main()
