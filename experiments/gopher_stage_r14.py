"""A/B: nd_gopher_filter flat projection (split(lower(text)) re-derived
~12x per row across flags + kept) vs staged projections (w, then counts,
then flags — multi-use aliases block CollapseProject, so each base
expression evaluates once). Guide §1.2 step 2 (per-task work).

Run: python experiments/gopher_stage_r14.py [sf_dir]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.operators.curation import _STOP_MARKERS, nd_gopher_filter
from bacalhau_spark.operators.text import words
from bacalhau_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def gopher_staged(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in _STOP_MARKERS])
    s1 = docs.select("doc_id", "text", words("text").alias("w"))
    s2 = s1.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .alias("len_ns"),
        F.size(F.filter("w", lambda x: F.array_contains(stop_arr, x)))
        .alias("n_stop"),
        F.size(F.filter("w", lambda x: x.rlike("^[a-z]+$")))
        .alias("n_alpha"))
    n_words, len_ns = F.col("n_words"), F.col("len_ns")
    f_words = (n_words >= 15) & (n_words <= 90)
    f_wlen = (len_ns * 10 >= n_words * 25) & (len_ns * 10 <= n_words * 65)
    f_stop = F.col("n_stop") >= 2
    f_alpha = F.col("n_alpha") * 10 >= n_words * 8
    return (s2.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        f_words.cast("int").alias("f_words"),
        f_wlen.cast("int").alias("f_wlen"),
        f_stop.cast("int").alias("f_stop"),
        f_alpha.cast("int").alias("f_alpha"),
        (f_words & f_wlen & f_stop & f_alpha).cast("int").alias("kept"))
        .orderBy("doc_id"))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_session("gopher-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")
    cur = nd_gopher_filter(spark, SF).collect()
    new = gopher_staged(spark, SF).collect()
    assert cur == new, "MISMATCH"
    print(f"equality OK ({len(cur)} rows, {SF})")
    variants = {"flat": nd_gopher_filter, "staged": gopher_staged}
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
