"""Round-14: amortizing the winnow READ-time df cap (r13 verdict #4).

r13 moved the df cap from build time to read time so the persisted
posting artifact stays per-doc-pure (delta adoption retained) — at the
cost of every read re-paying the ~0.25 s window guard. r14 caches the
df-CAPPED pair-ready frame at the SESSION tier (winnow_capped_postings:
persist()-backed, recompute-on-loss, fingerprint-keyed), artifact
unchanged. This measures warm reads A/B INTERLEAVED in one session
(the cross-session-timing rule): old = guard re-run per read over the
shared posting index; new = expansion over the session-cached capped
frame. Run: python experiments/winnow_read_r14.py [sf_dir] [reps]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bacalhau_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session("winnow-read-r14",
                        extra_conf={"spark.driver.memory": "12g"})
    spark.sparkContext.setLogLevel("ERROR")
    from bacalhau_spark.operators.dedup import (
        nd_winnowing, winnow_pairs_from_postings, winnow_posting_index)

    winnow_posting_index(spark, sf_dir).count()  # build + publish once
    nd_winnowing(spark, sf_dir).count()          # warm the capped cache

    old_t, new_t = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        n_old = winnow_pairs_from_postings(
            winnow_posting_index(spark, sf_dir)).count()
        old_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        n_new = nd_winnowing(spark, sf_dir).count()
        new_t.append(time.perf_counter() - t0)
        assert n_old == n_new, (n_old, n_new)
    print(f"sf={sf_dir} pairs={n_new} reps={reps}")
    print(f"warm read, guard per read (r13 shape): "
          f"median {statistics.median(old_t):.3f}s "
          f"(min {min(old_t):.3f})")
    print(f"warm read, session-cached capped frame (r14): "
          f"median {statistics.median(new_t):.3f}s "
          f"(min {min(new_t):.3f})")
    spark.stop()


if __name__ == "__main__":
    main()
