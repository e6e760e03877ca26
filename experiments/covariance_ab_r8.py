"""A/B: nd_embedding_covariance (codegen explode, N x 2080 rows through
the partial agg) vs nd_embedding_covariance_fast (Arrow-batched int64
Gram matmul, 2080 rows per batch) at sf0.1 and 10x — both value-hash
against the same DuckDB oracle, so this is a pure physical-plan race.
Interleaved round-robin, median of 3 after a warm pass (the round-6
timing rule). Run:
    python experiments/covariance_ab_r8.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import SF_DIR, build_scaled_embeddings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    from bacalhau_spark.operators.similarity import (
        nd_embedding_covariance, nd_embedding_covariance_fast)
    from bacalhau_spark.session import get_session

    spark = get_session("covariance-ab-r8")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"exact_explode": nd_embedding_covariance,
                "arrow_gram": nd_embedding_covariance_fast}
    for label, d in (("sf0.1", SF_DIR),
                     (f"sf0.1x{args.mult}",
                      build_scaled_embeddings(args.scratch, args.mult))):
        for fn in variants.values():  # warm both
            fn(spark, d).write.mode("overwrite").format("noop").save()
        times: dict[str, list[float]] = {k: [] for k in variants}
        for _ in range(3):  # interleaved round-robin
            for k, fn in variants.items():
                t0 = time.monotonic()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                times[k].append(time.monotonic() - t0)
        print(json.dumps({"ab": "covariance", "scale": label,
                          **{k: round(statistics.median(v), 3)
                             for k, v in times.items()}}), flush=True)


if __name__ == "__main__":
    main()
