"""A/B: boilerplate_strip keep-first as groupBy+join (chunk lineage
evaluated twice on the decision side) vs min-struct WINDOW over ch (one
lineage, same exchange key), plus base-branch de-spread. Guide §2.4.

Run: python experiments/boiler_window_r14.py [sf_dir]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators.dedup import (BOILER_CHUNK_WORDS,
                                            nd_boilerplate_strip, words)
from bacalhau_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def boiler_window(spark, sf_dir):
    docs = spread_compute(spark, table(spark, sf_dir, "documents")
                          .select("doc_id", "text"), "doc_id")
    w = docs.select("doc_id", words("text").alias("w"))
    n_chunks = F.ceil(F.size("w") / BOILER_CHUNK_WORDS).cast("int")
    chunk_strs = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("w"), i * BOILER_CHUNK_WORDS + 1,
                         BOILER_CHUNK_WORDS)))
    chunks = (w.select("doc_id",
                       F.posexplode(chunk_strs).alias("idx", "chunk"))
              .withColumn("ch", F.conv(
                  F.substring(F.md5("chunk"), 1, 15), 16, 10)
                  .cast("long")))
    narrow = chunks.select("doc_id", "idx", "ch")
    kept_ids = (narrow.withColumn(
        "m", F.min(F.struct("doc_id", "idx")).over(Window.partitionBy("ch")))
        .where((F.col("doc_id") == F.col("m.doc_id"))
               & (F.col("idx") == F.col("m.idx")))
        .select("doc_id", "idx"))
    stats = (chunks.select("doc_id", "idx", "chunk")
             .join(kept_ids, ["doc_id", "idx"])
             .groupBy("doc_id")
             .agg(F.count("*").cast("int").alias("n_kept"),
                  F.md5(F.array_join(F.transform(
                      F.array_sort(F.collect_list(
                          F.struct("idx", "chunk"))),
                      lambda x: x["chunk"]), " ")).alias("clean_md5")))
    base = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.ceil(F.size(words("text")) / BOILER_CHUNK_WORDS).cast("int")
        .alias("n_chunks"))
    return (base.join(stats, "doc_id", "left")
            .select("doc_id", "n_chunks",
                    F.coalesce("n_kept", F.lit(0)).cast("int")
                    .alias("n_kept"),
                    F.coalesce("clean_md5", F.md5(F.lit("")))
                    .alias("clean_md5"))
            .orderBy("doc_id"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_session("boiler-ab")
    spark.sparkContext.setLogLevel("ERROR")
    a = nd_boilerplate_strip(spark, SF).collect()
    b = boiler_window(spark, SF).collect()
    assert a == b, "MISMATCH"
    print("equality OK", len(a))
    variants = {"current": nd_boilerplate_strip, "window": boiler_window}
    for fn in variants.values():
        for _ in range(2):
            noop(fn(spark, SF))
    times = {k: [] for k in variants}
    for _ in range(7):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            noop(fn(spark, SF))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:8s} median {statistics.median(ts):.3f}s "
              f"min {min(ts):.3f} max {max(ts):.3f}")


if __name__ == "__main__":
    main()
