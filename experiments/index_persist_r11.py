"""Round-11 index-persistence A/B: the shared dedup/ANN indexes now live
in a versioned parquet store keyed by source-content fingerprint
(operators/dedup._mh_session_cached tier 2). This measures, at sf0.1:

  (a) FULL COLD — store evicted: one nd_minhash_lsh call pays
      signature+band build, the parquet PUBLISH (write_version) and the
      read-back. This is what bench.py's nd_minhash_lsh_cold_s measures
      from round 11 on; the pre-r11 series measured build+probe without
      a publish, so the step between them is the publish cost isolated
      in (b).
  (b) PUBLISH-ONLY decomposition: the same build with the store
      DISABLED (forced localCheckpoint fallback) — (a) minus (b) is the
      write+read overhead the new artifact costs.
  (c) COLD SESSION ADOPT — session tier dropped, store kept: the call
      reads the persisted index instead of rebuilding (the cross-session
      reuse the round-10 verdict asked for; a NEW process measures the
      same path, which the paired test pins functionally).
  (d) WARM PROBE — both tiers hot: the steady-state consumer read.

Protocol: median of 3 after one warm-up of the non-index machinery
(scan/codegen paths), noop sink. Run:
    python experiments/index_persist_r11.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _median(fn, n=3) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    from bacalhau_spark.operators import dedup
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("index-persist-r11")
    spark.sparkContext.setLogLevel("ERROR")
    mh_fn, _ = ALL_QUERIES["nd_minhash_lsh"]

    # machinery warm-up (scan/codegen), then evict everything
    _noop(mh_fn(spark, SF_DIR))

    def full_cold():
        dedup.clear_session_index(spark, persisted=True)
        _noop(mh_fn(spark, SF_DIR))

    full_cold_s = _median(full_cold)

    # store disabled: point the store at an unwritable path so the
    # build falls back to the pre-r11 localCheckpoint shape
    def no_store_cold():
        dedup.clear_session_index(spark, persisted=True)
        os.environ["SPARK_GRAFT_INDEX_STORE"] = "/proc/denied-index-store"
        try:
            _noop(mh_fn(spark, SF_DIR))
        finally:
            del os.environ["SPARK_GRAFT_INDEX_STORE"]

    no_store_cold_s = _median(no_store_cold)

    # adopt: build+publish once, then drop ONLY the session tier per run
    dedup.clear_session_index(spark, persisted=True)
    _noop(mh_fn(spark, SF_DIR))

    def adopt():
        dedup.clear_session_index(spark)  # session tier only
        _noop(mh_fn(spark, SF_DIR))

    adopt_s = _median(adopt)
    warm_s = _median(lambda: _noop(mh_fn(spark, SF_DIR)))

    print(json.dumps({
        "sf_dir": SF_DIR,
        "full_cold_s": full_cold_s,           # build + publish + read
        "prev_basis_cold_s": no_store_cold_s, # build + localCheckpoint
        "publish_overhead_s": round(full_cold_s - no_store_cold_s, 3),
        "cold_session_adopt_s": adopt_s,      # read persisted index
        "warm_probe_s": warm_s,
        "adopt_speedup_vs_cold": round(full_cold_s / max(adopt_s, 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
