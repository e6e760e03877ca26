"""Round-14 closing slice: session-shared shingle posting index for the
jaccard family (shingle_posting_index). ngram/containment consume
identical df-capped posting lists and weighted derives its rarity
weight from the list length the posting row already carries, so one
checkpointed build can serve all three registered rows per
(session, table content) — the minhash-signature-index lifecycle
applied to the inverted-index family (its persisted tier + delta story
stays the documented round-2 candidate).

Measures, in ONE session:
  1. the FAMILY SEQUENCE (the driver/sweep shape): all three rows
     back to back — "independent" = the frame-level generics with
     postings=None (the pre-change per-row build, still the arbitrary-
     frame path), "shared" = the registered rows over the session
     index (first call builds, the other two hit);
  2. repeated warm calls of one row (the cache-hit probe path).
Row equality between the two paths is asserted first.

Run: python experiments/posting_index_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators import dedup as D
from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS = ("nd_ngram_jaccard", "nd_weighted_jaccard", "nd_containment")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _docs(spark):
    return spread_compute(spark, table(spark, SF, "documents")
                          .select("doc_id", "text"), "doc_id")


def independent(spark):
    """The pre-change family sequence: each generic builds its own
    postings (postings=None is the arbitrary-frame path)."""
    return [D.ngram_jaccard_pairs(_docs(spark)),
            D.weighted_jaccard_pairs(_docs(spark)),
            D.containment_pairs(_docs(spark))]


def shared(spark):
    return [ALL_QUERIES[n][0](spark, SF) for n in ROWS]


def evict(spark):
    app_id = spark.sparkContext.applicationId
    with D._MH_IDX_LOCK:
        for k in [k for k in D._MH_IDX_CACHE
                  if k[0] == app_id and str(k[3]).startswith("shpost:")]:
            D._MH_IDX_CACHE.pop(k, None)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_session("posting-index-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for a, b, name in zip(independent(spark), shared(spark), ROWS):
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, f"{name}: rows differ!"
        print(f"{name}: equality OK ({len(ra)} rows)")
    # warm both paths once
    for df in independent(spark):
        noop(df)
    evict(spark)
    for df in shared(spark):
        noop(df)
    # Per-ROW interleaved A/B (steal on this box is bursty — a whole
    # 3-row sequence per sample absorbs entire bursts; alternating at
    # row granularity averages them): "fresh" = the frame-level generic
    # building its own postings (the pre-change per-call shape),
    # "indexed" = the registered row over the hot session index (the
    # warm probe basis every index family uses). The index BUILD cost
    # itself is timed separately below.
    gens = {"nd_ngram_jaccard": lambda: D.ngram_jaccard_pairs(_docs(spark)),
            "nd_weighted_jaccard":
                lambda: D.weighted_jaccard_pairs(_docs(spark)),
            "nd_containment": lambda: D.containment_pairs(_docs(spark))}
    for name in ROWS:
        fn = ALL_QUERIES[name][0]
        t_a, t_b = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(gens[name]())
            t_a.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(fn(spark, SF))
            t_b.append(time.perf_counter() - t0)
        print(f"{name}: fresh-build median {statistics.median(t_a):.3f}s "
              f"min {min(t_a):.3f} max {max(t_a):.3f}")
        print(f"{name}: indexed     median {statistics.median(t_b):.3f}s "
              f"min {min(t_b):.3f} max {max(t_b):.3f}")
    # index build vs hit
    t_build, t_hit2 = [], []
    for _ in range(reps):
        evict(spark)
        t0 = time.perf_counter()
        D.shingle_posting_index(spark, SF)
        t_build.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        D.shingle_posting_index(spark, SF)
        t_hit2.append(time.perf_counter() - t0)
    print(f"posting index build median {statistics.median(t_build):.3f}s, "
          f"cache hit {statistics.median(t_hit2)*1000:.1f}ms")
    # repeated warm single row: the probe path (index already hot)
    fn = ALL_QUERIES["nd_ngram_jaccard"][0]
    noop(fn(spark, SF))
    t_hit = []
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(fn(spark, SF))
        t_hit.append(time.perf_counter() - t0)
    print(f"nd_ngram_jaccard warm probe (index hot): median "
          f"{statistics.median(t_hit):.3f}s min {min(t_hit):.3f} "
          f"max {max(t_hit):.3f}")


if __name__ == "__main__":
    main()
