"""Round-11 crossover sweep: the round's new/changed operators vs their
DuckDB oracles at sf0.1 and x10 (x30 via --mult).

Queries: nd_html_extract (per-row regexp chain — should scale like the
canon chain), nd_image_phash (band-bucketed near-dup; candidate volume
scales with variant families, verification with candidates),
nd_domain_cap_keep (two-stage partial top-K vs DuckDB's one window),
nd_quality_model_labeled (label-join training is bounded; scoring
scales), and re-measures for nd_domain_cap (window dropped this round —
the audit should now beat its r10 self) and nd_minhash_lsh COLD
(the cold path now includes the index-store publish; its r10 partner is
the localCheckpoint build).

Protocol: registry_crossover_r9's — per-run builds, noop sink, median
of 3 after warm; DuckDB median of 3 on the same files. Run:
    python experiments/registry_crossover_r11.py [--mult 10]
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

    from bacalhau_spark.operators.dedup import clear_session_index
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r11")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        docs_d = (SF_DIR if mult == 1
                  else build_scaled_perturbed(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_d}/documents.parquet')")
        for q in ("nd_html_extract", "nd_image_phash",
                  "nd_domain_cap_keep", "nd_domain_cap",
                  "nd_quality_model_labeled"):
            _oracle_vs(spark, con, q, docs_d, label)
        if mult == 1:
            # the last baseline-less headline row (round-10 verdict,
            # What's wrong #5): nd_grouped_python vs its regr_slope
            # oracle at sf0.1 — for BASELINE.md §9
            con.execute("CREATE VIEW events AS SELECT * FROM "
                        f"read_parquet('{SF_DIR}/events.parquet')")
            _oracle_vs(spark, con, "nd_grouped_python", docs_d, label)
        con.close()

    # cold minhash with the persisted store: per-run FULL cold
    # (build + publish + read) — the round-11 bench basis
    fn, _ = ALL_QUERIES["nd_minhash_lsh"]
    colds = []
    for _ in range(3):
        clear_session_index(spark, persisted=True)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        colds.append(time.perf_counter() - t0)
    print(json.dumps({
        "query": "nd_minhash_lsh_cold_with_publish", "scale": "sf0.1",
        "spark_s": round(statistics.median(colds), 3),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
