"""Round-9 A/B: the session-shared minhash signature/band index
(dedup.minhash_signature_index / band_candidate_index) vs the round-8
rebuild-per-query behavior, on the LSH consumers — headline case
nd_editdist_dedup, whose 17.1 s at x10 was ~90% signature rebuild
(registry_crossover_r8d.txt adjacency; VERDICT r8 Next #3).

COLD = cache cleared before every run (the round-8 behavior: every call
re-derives the shingle->minhash->band lineage). WARM = index built once,
runs measure the consumer's own work (the production read path: the
pipeline builds the index once and band-joins it many times). The index
build itself is timed separately. Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/minhash_index_reuse_r9.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import (SF_DIR, build_scaled_perturbed)

CONSUMERS = ("nd_editdist_dedup", "nd_minhash_lsh", "nd_dedup_survivors",
             "nd_minhash_estimate")


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _clear_cache() -> None:
    from bacalhau_spark.operators import dedup
    with dedup._MH_IDX_LOCK:
        dedup._MH_IDX_CACHE.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    from bacalhau_spark.operators.dedup import (band_candidate_index,
                                                minhash_signature_index)
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("minhash-index-reuse-r9")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        d = (SF_DIR if mult == 1
             else build_scaled_perturbed(args.scratch, mult))

        # index build cost (cold, median of 3 full rebuilds)
        builds = []
        for _ in range(3):
            _clear_cache()
            t0 = time.perf_counter()
            minhash_signature_index(spark, d)
            band_candidate_index(spark, d)
            builds.append(time.perf_counter() - t0)
        print(json.dumps({"stage": "index_build", "scale": label,
                          "median_s": round(statistics.median(builds), 3)}),
              flush=True)

        for name in CONSUMERS:
            fn, _ = ALL_QUERIES[name]
            _noop(fn(spark, d))  # warm codegen once (index now cached)
            cold, warm = [], []
            for _ in range(3):
                _clear_cache()
                t0 = time.perf_counter()
                _noop(fn(spark, d))
                cold.append(time.perf_counter() - t0)
            minhash_signature_index(spark, d)
            band_candidate_index(spark, d)
            for _ in range(3):
                t0 = time.perf_counter()
                _noop(fn(spark, d))
                warm.append(time.perf_counter() - t0)
            print(json.dumps({
                "query": name, "scale": label,
                "cold_s": round(statistics.median(cold), 3),
                "warm_s": round(statistics.median(warm), 3),
                "speedup": round(statistics.median(cold)
                                 / statistics.median(warm), 2)}),
                flush=True)


if __name__ == "__main__":
    main()
