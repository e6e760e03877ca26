"""Round-12 crossover sweep: the MATERIALIZED crawl front door vs the
per-query re-derivation it replaced (round-11 verdict #1).

The round-11 x100 numbers (registry_crossover_r11.txt:93-97) measured
every web-plane consumer re-running the canon/extract chain per query:
blocklist 9.99x, cap 2.82x, cap_keep 3.09x, canonicalize 1.83x,
html_extract 2.16x. Round 12 publishes the chain ONCE per source
content (web.canon_index / web.html_extract_index in the persisted
index store); consumers scan the artifact. This sweep records, at
sf0.1 and x100:

- warm rows: the production ARTIFACT-READ path per consumer vs the
  DuckDB oracle (which re-derives the full chain per query — exactly
  what the r11 Spark side also did, so ratio movement vs r11 isolates
  the materialization);
- cold rows: the one-time build+publish+read cost of each artifact
  (what the ingest job pays once per crawl epoch).

Protocol: registry_crossover_r9's — per-run builds, noop sink, median
of 3 after warm; DuckDB median of 3 on the same files. Run:
    python experiments/registry_crossover_r12.py [--mult 100]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover_r9 import _oracle_vs
from experiments.scale_crossover import SF_DIR, build_scaled_perturbed

WEB_ROWS = ("nd_url_canonicalize", "nd_domain_blocklist",
            "nd_domain_cap", "nd_domain_cap_keep", "nd_html_extract")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.operators.dedup import clear_session_index
    from bacalhau_spark.operators.web import canon_index, html_extract_index
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r12")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        docs_d = (SF_DIR if mult == 1
                  else build_scaled_perturbed(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_d}/documents.parquet')")
        # cold: the one-time artifact build (both tiers evicted per run)
        for kind, fn in (("canon", canon_index),
                         ("extract", html_extract_index)):
            runs = []
            for _ in range(3):
                clear_session_index(spark, persisted=True)
                t0 = time.perf_counter()
                fn(spark, docs_d).write.mode("overwrite") \
                    .format("noop").save()
                runs.append(time.perf_counter() - t0)
            print(json.dumps({
                "query": f"{kind}_index_cold_build", "scale": label,
                "spark_s": round(statistics.median(runs), 3)}),
                flush=True)
        # warm: every consumer reads the artifact; DuckDB re-derives
        for q in WEB_ROWS:
            _oracle_vs(spark, con, q, docs_d, label)
        con.close()
    spark.stop()


if __name__ == "__main__":
    main()
