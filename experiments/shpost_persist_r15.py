"""A/B: the jaccard posting tier's NEW persisted artifact (r15) vs the
r14 session-only build, interleaved in one session (the only trustworthy
cross-variant evidence on this steal-prone box).

Variants, each starting from a COLD session tier (clear_session_index,
non-persisted — the store artifact stays published, exactly the
production next-session shape):
  A (r15 path): shingle_posting_index — artifact scan + group/cap
                checkpoint, then the nd_ngram_jaccard row end to end.
  B (r14 path): _shingle_postings(docs) — tokenize + md5 + group/cap
                checkpoint, then the same row over it (fresh generics).
Also timed: the one-shot COLD cold (persisted eviction included): the
build + publish + probe an ingest epoch pays under the new layout.

Run: python experiments/shpost_persist_r15.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators import dedup as D
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_session("shpost-persist-r15")
    spark.sparkContext.setLogLevel("ERROR")

    def row_over(pair_stats):
        docs = spread_compute(spark, table(spark, SF, "documents")
                              .select("doc_id", "text"), "doc_id")
        return D.ngram_jaccard_pairs(docs, pair_stats=pair_stats)

    # one-shot cold (both tiers evicted): build + publish + probe
    colds = []
    for _ in range(3):
        D.clear_session_index(spark, persisted=True)
        t0 = time.perf_counter()
        noop(D.nd_ngram_jaccard(spark, SF))
        colds.append(time.perf_counter() - t0)
    print(f"cold build+publish+probe (x3): "
          f"{[round(t, 2) for t in colds]} "
          f"median {statistics.median(colds):.2f}s")

    # interleaved session-cold A/B with the artifact published
    a_runs, b_runs = [], []
    for _ in range(5):
        D.clear_session_index(spark)  # session tier only
        t0 = time.perf_counter()
        noop(D.nd_ngram_jaccard(spark, SF))  # A: artifact scan + derive
        a_runs.append(time.perf_counter() - t0)

        D.clear_session_index(spark)
        docs = spread_compute(spark, table(spark, SF, "documents")
                              .select("doc_id", "text"), "doc_id")
        t0 = time.perf_counter()
        postings = D._shingle_postings(docs, 3, D.SHINGLE_DF_CAP)
        shared, sizes = D._shingle_pair_stats(None, 3, D.SHINGLE_DF_CAP,
                                              postings=postings)
        noop(row_over((shared.localCheckpoint(eager=True),
                       sizes.localCheckpoint(eager=True))))
        b_runs.append(time.perf_counter() - t0)
    print(f"A r15 artifact-read session-cold: "
          f"{[round(t, 2) for t in a_runs]} "
          f"median {statistics.median(a_runs):.2f}s")
    print(f"B r14 fresh-build session-cold:  "
          f"{[round(t, 2) for t in b_runs]} "
          f"median {statistics.median(b_runs):.2f}s")

    # value equality of the two paths (belt over the oracle gate)
    D.clear_session_index(spark)
    a_rows = sorted(map(tuple, D.nd_ngram_jaccard(spark, SF).collect()))
    docs = spread_compute(spark, table(spark, SF, "documents")
                          .select("doc_id", "text"), "doc_id")
    b_rows = sorted(map(tuple, D.ngram_jaccard_pairs(docs).collect()))
    assert a_rows == b_rows, "artifact path diverges from fresh build"
    print(f"value equality: OK ({len(a_rows)} pairs)")


if __name__ == "__main__":
    main()
