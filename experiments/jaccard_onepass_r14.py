"""Round-14 A/B: collapse _shingle_postings' distinct + groupBy double
shuffle into ONE shingle-keyed collect_set aggregation.

Current form: (doc_id, shingle) rows -> .distinct() (exchange 1 on the
pair) -> groupBy(shingle).collect_list (exchange 2 on shingle).
Candidate: groupBy(shingle).agg(sort_array(collect_set(doc_id))) — the
partial ObjectHashAggregate dedupes (doc, shingle) map-side, so one
exchange moves already-reduced sets instead of two exchanges moving the
raw pair stream twice. Posting lists are identical (set semantics +
sort_array), so every downstream row is identical.

Interleaved in-session A/B (the only honest comparison on this box —
see OPTIMIZATION_r14.md header), run on the full registered
nd_ngram_jaccard query: variant B monkeypatches _shingle_postings.

Run: python experiments/jaccard_onepass_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.operators import dedup
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_orig = dedup._shingle_postings


def _onepass(docs, n, df_cap):
    from bacalhau_spark.functions import shingles, words
    sh = (docs.select("doc_id", words("text").alias("w"))
          .select("doc_id",
                  F.explode(shingles(F.col("w"), n)).alias("s"))
          .select("doc_id",
                  F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
                  .cast("long").alias("shingle")))
    width = docs.sparkSession.sparkContext.defaultParallelism
    return (sh.groupBy("shingle")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .where(F.size("ids") <= df_cap)
            .repartition(width, "shingle")
            .localCheckpoint(eager=True))


def _run(spark, which):
    dedup._shingle_postings = _orig if which == "current" else _onepass
    try:
        df = dedup.nd_ngram_jaccard(spark, SF)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0
    finally:
        dedup._shingle_postings = _orig


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_session("jaccard-onepass-ab-r14")
    spark.sparkContext.setLogLevel("ERROR")

    # rows identical first (the non-negotiable)
    dedup._shingle_postings = _orig
    a_rows = dedup.nd_ngram_jaccard(spark, SF).collect()
    dedup._shingle_postings = _onepass
    b_rows = dedup.nd_ngram_jaccard(spark, SF).collect()
    dedup._shingle_postings = _orig
    assert a_rows == b_rows, (len(a_rows), len(b_rows))
    print(f"rows identical: {len(a_rows)}", flush=True)

    times: dict[str, list[float]] = {"current": [], "onepass": []}
    _run(spark, "current"); _run(spark, "onepass")  # warm both
    for i in range(reps):
        for which in ("current", "onepass") if i % 2 == 0 else (
                "onepass", "current"):
            times[which].append(_run(spark, which))
    for which, ts in times.items():
        print(f"{which:8s} median {statistics.median(ts):6.3f}s  "
              f"all {[round(t, 3) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
