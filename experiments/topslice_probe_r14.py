"""Round-14 closing-slice probe: repeated warm noop-sink medians for the
rows the post-optimization registry sweep ranked slowest — including the
rows the first pass did not examine in depth (neardup_decontam,
incremental_minhash, simhash, q04). Medians of N inside ONE session so
the ranking is load-robust (single-shot sweep numbers moved 4x between
two consecutive sweeps on this box).

Run: python experiments/topslice_probe_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = [
    "nd_neardup_decontam",
    "nd_ngram_jaccard",
    "nd_incremental_minhash",
    "nd_image_phash_real",
    "nd_containment",
    "nd_simhash",
    "nd_weighted_jaccard",
    "nd_embedding_covariance",
    "q04_math_funcs",
    "nd_curation_pipeline",
    "nd_incremental_dedup",
    "nd_chunk_dedup",
    "nd_heavy_hitters_cms",
    "nd_bigram_surprisal",
    "nd_substr_dedup",
    "tpch_q16_supplier_cnt",
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session("topslice-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # global warm pass (codegen/JIT ramp)
    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        fn(spark, SF).write.mode("overwrite").format("noop").save()
    out = []
    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        out.append((statistics.median(runs), min(runs), max(runs), name))
    for med, lo, hi, name in sorted(out, reverse=True):
        print(f"{name:28s} median {med:6.3f}s  min {lo:6.3f}  max {hi:6.3f}")


if __name__ == "__main__":
    main()
