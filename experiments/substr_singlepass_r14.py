"""A/B: nd_substr_dedup current (two hash passes: dc branch + freq branch,
no subplan sharing) vs single-pass variant (corpus frequency derived from
the SAME (doc_id, wh) aggregate via a window over wh).

Current plan (plans/r14/nd_substr_dedup_before.txt): the tokenize+md5
window-hash Generate appears TWICE (nodes 8 and 16) because freq =
dc.groupBy(wh) re-derives dc's lineage from the scan — Spark shares no
subplans across DataFrame branches — and spread_compute repartitions the
raw text for each branch (3 scans, 2 full-text exchanges).

Variant: freq via sum(c) over Window.partitionBy(wh) on dc itself — one
scan + one text exchange + ONE hash pass; the wh window shuffles only the
compact (doc_id, wh, c, ps) aggregate rows; the run-detection window then
re-shuffles only shared (doc_id, pos) pairs. Guide §2.3/§2.4 (shuffle
fewer bytes; remove duplicated subtrees).

Run: python experiments/substr_singlepass_r14.py [sf_dir]
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
from bacalhau_spark.operators.dedup import SUBSTR_WIN, nd_substr_dedup, words
from bacalhau_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def substr_singlepass(spark, sf_dir):
    docs = spread_compute(spark, table(spark, sf_dir, "documents")
                          .select("doc_id", "text"), "doc_id")
    w = docs.select("doc_id", words("text").alias("w"))
    n = F.size("w")
    win_hash = F.when(n >= SUBSTR_WIN, F.transform(
        F.sequence(F.lit(0), n - SUBSTR_WIN),
        lambda i: F.conv(F.substring(F.md5(F.concat_ws(
            " ", F.slice(F.col("w"), i + 1, SUBSTR_WIN))), 1, 15),
            16, 10).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    wins = w.select("doc_id", F.posexplode(win_hash).alias("pos", "wh"))
    dc = (wins.groupBy("doc_id", "wh")
          .agg(F.count("*").alias("c"),
               F.collect_list("pos").alias("ps")))
    shared_pos = (dc.withColumn("f", F.sum("c").over(
        Window.partitionBy("wh")))
        .where(F.col("f") > 1)
        .select("doc_id", F.explode("ps").alias("pos")))
    run_w = Window.partitionBy("doc_id").orderBy("pos")
    per_doc = (shared_pos
               .withColumn("grp", F.col("pos") - F.row_number().over(run_w))
               .groupBy("doc_id", "grp").agg(F.count("*").alias("run"))
               .groupBy("doc_id")
               .agg(F.max("run").alias("max_run"),
                    F.sum("run").alias("n_shared")))
    base = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.greatest(F.size(words("text")) - SUBSTR_WIN + 1, F.lit(0))
        .cast("long").alias("n_windows"))
    return (base.join(per_doc, "doc_id", "left")
            .select("doc_id", "n_windows",
                    F.coalesce("n_shared", F.lit(0)).cast("long")
                    .alias("shared_windows"),
                    F.coalesce("max_run", F.lit(0)).cast("long")
                    .alias("longest_run"),
                    F.coalesce(F.col("max_run") + (SUBSTR_WIN - 1),
                               F.lit(0)).cast("long")
                    .alias("longest_span_words"))
            .orderBy("doc_id"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_session("substr-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")

    # Equality first (sf0.01 full collect + sf arg row hash).
    cur = nd_substr_dedup(spark, SF).collect()
    new = substr_singlepass(spark, SF).collect()
    assert cur == new, f"MISMATCH rows cur={len(cur)} new={len(new)}"
    print(f"equality OK ({len(cur)} rows identical, {SF})")

    variants = {"current": nd_substr_dedup, "singlepass": substr_singlepass}
    for fn in variants.values():  # warm both
        for _ in range(2):
            noop(fn(spark, SF))
    times = {k: [] for k in variants}
    for _ in range(7):  # interleaved round-robin
        for k, fn in variants.items():
            t0 = time.perf_counter()
            noop(fn(spark, SF))
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:12s} median {statistics.median(ts):.3f}s "
              f"min {min(ts):.3f} max {max(ts):.3f}")


if __name__ == "__main__":
    main()
