"""Round-12 modality crossover: the new audio/video near-dup screens vs
DuckDB at sf0.1 and x10 — the scale evidence for the two rows that
joined the bench headline this round (the registry_crossover protocol:
per-run warm medians via the noop sink, DuckDB median of 3 on the same
files; a COLD row records the one-shot build+publish+read an ingest
epoch pays).

Scaling note: the perceptual hashes are pure functions of doc_id (the
synthesis convention), so the x10 corpus only needs 10x the ids —
build_scaled_perturbed's shifted-replica ids keep the family structure
(base = id div 7) intact and family count grows linearly.

Run:  python experiments/modality_crossover_r12.py [--mult 10]
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

ROWS = ("nd_audio_phash", "nd_video_phash")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.operators.dedup import clear_session_index
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("modality-crossover-r12")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = build_scaled_perturbed(args.scratch, args.mult)
    for label, d in (("sf0.1", SF_DIR), (f"sf0.1x{args.mult}", scaled)):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
        for name in ROWS:
            # cold: one-shot build+publish+read, both cache tiers evicted
            fn, _sql = ALL_QUERIES[name]
            runs = []
            for _ in range(3):
                clear_session_index(spark, persisted=True)
                t0 = time.perf_counter()
                fn(spark, d).write.mode("overwrite") \
                    .format("noop").save()
                runs.append(time.perf_counter() - t0)
            print(json.dumps({
                "query": f"{name}_cold", "scale": label,
                "spark_s": round(statistics.median(runs), 3)}),
                flush=True)
            # warm: the persisted-index probe vs DuckDB re-deriving
            _oracle_vs(spark, con, name, d, label)
        con.close()
    spark.stop()


if __name__ == "__main__":
    main()
