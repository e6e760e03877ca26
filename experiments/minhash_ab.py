"""A/B the nd_minhash_lsh stages on the current Spark runtime.

Round-3 shipped a rewrite (rolling-hash shingle keys, integer band keys,
bucket-and-expand) that the judge measured at ~2.1 s at sf0.1 versus 1.14 s
for the round-2 form — despite the rewrite benching faster when it was
written (on Spark 4.0). This script times each stage in isolation so the
regression can be pinned to a stage rather than guessed at.

Run: python experiments/minhash_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators import dedup
from bacalhau_spark.session import get_session


def timeit(label, make_df, runs=5, warmups=2):
    for _ in range(warmups):
        make_df().write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        make_df().write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{label:45s} med={med:6.3f}  min={min(ts):6.3f}  max={max(ts):6.3f}")
    return med


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("minhash-ab")
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark
    print("pyspark", pyspark.__version__)

    docs = lambda: spread_compute(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id")

    # Stage 1: word hashes only
    timeit("word_hashes", lambda: docs().select(
        "doc_id", dedup._word_hashes(F.col("text")).alias("wh")))

    # Stage 2: + rolling shingle keys (exploded)
    def sh():
        wh = docs().select("doc_id",
                           dedup._word_hashes(F.col("text")).alias("wh"))
        return wh.select(
            "doc_id",
            F.explode(dedup._rolling_shingle_keys(F.col("wh"))).alias("x"))
    timeit("shingle_keys_exploded", sh)

    # Stage 3: full signature table (16 min-aggs)
    timeit("signatures", lambda: dedup._minhash_signatures(spark, sf_dir))

    # Stage 4: full pipeline (band candidates, no order)
    timeit("band_candidates",
           lambda: dedup._band_candidates(dedup._minhash_signatures(spark, sf_dir)))

    # Stage 5: full query incl. orderBy
    timeit("nd_minhash_lsh (full)",
           lambda: dedup.nd_minhash_lsh(spark, sf_dir))

    spark.stop()


if __name__ == "__main__":
    main()
