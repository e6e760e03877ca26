"""Round-10 crossover sweep.

Parts:
  (a) the new operators vs their DuckDB oracles at sf0.1 and x10
      (x30 via --mult): nd_quality_model (training cost is
      scale-INVARIANT — the labeled slice stays doc_id < 200 at every
      multiplier, so only scoring scales), the web plane
      (nd_url_canonicalize / nd_domain_cap / nd_domain_blocklist), and
      the rebuilt 4-stage nd_curation_pipeline;
  (b) sf0.1 DuckDB baselines for the three headline rows the round-9
      verdict flagged as baseline-less in BENCH context (nd_kmeans,
      nd_substr_dedup, nd_editdist_dedup) — recorded here so
      BASELINE.md's round-10 section can carry them;
  (c) winnow index reuse: cold build vs warm probe of
      winnow_posting_index at sf0.1 (the minhash_index_reuse protocol
      applied to the round-10 shared winnow index).

Protocol as r8/r9 parts: median-of-3 after warm, noop sink; per-run
BUILDS are timed (never prebuilt checkpointed frames — the r9
self-correction, standing rule). Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/registry_crossover_r10.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover_r9 import _oracle_vs, median_noop
from experiments.scale_crossover import SF_DIR, build_scaled_perturbed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.operators.dedup import (clear_session_index,
                                                winnow_posting_index)
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r10")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        docs_d = (SF_DIR if mult == 1
                  else build_scaled_perturbed(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_d}/documents.parquet')")
        for q in ("nd_quality_model", "nd_url_canonicalize",
                  "nd_domain_cap", "nd_domain_blocklist",
                  "nd_curation_pipeline"):
            _oracle_vs(spark, con, q, docs_d, label + "p")
        if mult == 1:
            # (b) sf0.1 baselines for the baseline-less headline rows
            con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                        f"read_parquet('{SF_DIR}/embeddings.parquet')")
            for q in ("nd_kmeans", "nd_substr_dedup",
                      "nd_editdist_dedup"):
                _oracle_vs(spark, con, q, docs_d, label)
        con.close()

    # (c) winnow index: cold build vs warm probe at sf0.1
    colds, warms = [], []
    for _ in range(3):
        clear_session_index(spark)
        t0 = time.perf_counter()
        winnow_posting_index(spark, SF_DIR)  # eager checkpoint = build
        colds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        winnow_posting_index(spark, SF_DIR)
        warms.append(time.perf_counter() - t0)
    from bacalhau_spark.registry import ALL_QUERIES
    fn, _ = ALL_QUERIES["nd_winnowing"]
    clear_session_index(spark)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    query_cold = time.perf_counter() - t0
    query_warm = median_noop(lambda: fn(spark, SF_DIR))
    print(json.dumps({
        "query": "winnow_posting_index", "scale": "sf0.1",
        "build_cold_s": round(statistics.median(colds), 3),
        "probe_warm_s": round(statistics.median(warms), 4),
        "nd_winnowing_cold_s": round(query_cold, 3),
        "nd_winnowing_warm_s": query_warm,
    }), flush=True)


if __name__ == "__main__":
    main()
