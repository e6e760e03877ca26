"""Round-14 closing slice, second tier: session-shared pair-stats
frames for the jaccard family (shingle_pair_index). With the posting
tier hot, each registered row still re-expanded the posting lists
into (a<b) pairs and re-reduced them per call (pair explode + two
aggregations, ~1.3 s of each row's ~2 s at sf0.1); ngram and
containment consume byte-identical (shared, sizes) frames and
weighted their rarity-weighted twin, so the REDUCED frames are now
checkpointed once per (session, table content) — the phash
candidate-tier convention applied to this family. Per-call work left:
bounded broadcast joins + threshold + sort.

Measures, in ONE session, interleaved per row (A/B/A/B..., medians of
`reps`): "posting" = the pre-change registered path (pair_stats=None,
postings=the shared posting index), "pairtier" = the registered rows
over shingle_pair_index. Row equality asserted first. Both tiers are
warmed before timing so the numbers are the steady-state probe path;
the one-shot tier build and the cache-hit latency are reported
separately.

Run: python experiments/pair_tier_r14.py [reps]
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
FNS = {"nd_ngram_jaccard": D.ngram_jaccard_pairs,
       "nd_weighted_jaccard": D.weighted_jaccard_pairs,
       "nd_containment": D.containment_pairs}


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def _docs(spark):
    return spread_compute(spark, table(spark, SF, "documents")
                          .select("doc_id", "text"), "doc_id")


def posting_path(spark, name):
    """The pre-change registered shape: shared posting index, pair
    stats re-derived in-call."""
    return FNS[name](_docs(spark),
                     postings=D.shingle_posting_index(spark, SF))


def pairtier_path(spark, name):
    return ALL_QUERIES[name][0](spark, SF)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_session("pair-tier-ab")
    spark.sparkContext.setLogLevel("ERROR")

    for name in ROWS:  # equality first, then warm both paths
        a = sorted(map(tuple, posting_path(spark, name).collect()))
        b = sorted(map(tuple, pairtier_path(spark, name).collect()))
        assert a == b, f"{name}: pair-tier diverges"
        print(f"{name}: rows identical ({len(a)})")

    t0 = time.perf_counter()
    D.shingle_pair_index(spark, SF)
    hit_ms = (time.perf_counter() - t0) * 1e3
    print(f"tier cache hit: {hit_ms:.1f} ms")

    for name in ROWS:
        pa, pb = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(posting_path(spark, name))
            pa.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(pairtier_path(spark, name))
            pb.append(time.perf_counter() - t0)
        print(f"{name}: posting median {statistics.median(pa):.3f}s "
              f"(min {min(pa):.3f}) -> pairtier "
              f"{statistics.median(pb):.3f}s (min {min(pb):.3f})")

    # one-shot tier build cost (evict, rebuild both variants)
    D.clear_session_index(spark)
    t0 = time.perf_counter()
    D.shingle_pair_index(spark, SF)
    plain_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    D.shingle_pair_index(spark, SF, weighted=True)
    weighted_s = time.perf_counter() - t0
    print(f"tier build (incl posting tier): plain {plain_s:.3f}s, "
          f"weighted (+{weighted_s:.3f}s on the hot posting tier)")


if __name__ == "__main__":
    main()
