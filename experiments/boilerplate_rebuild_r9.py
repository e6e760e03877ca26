"""Round-9: nd_boilerplate_strip chunk-string rebuild (BASELINE §5
sketch, now code) vs the x100 single-box envelope. The round-8 form
re-sliced each doc's FULL word array on the rebuild side and ABORTED at
x100 (GCLocker allocation-retry thrash); the rebuild now reassembles
cleaned text from per-chunk strings (every reduce-side row bounded by
one chunk), so this sweep re-attempts x100 with the same 8 GB heap that
failed before. Spark fn vs its own DuckDB oracle, median-of-3 after
warm, noop sink. Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/boilerplate_rebuild_r9.py [--mults 1,10,30,100]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import SF_DIR, build_scaled_perturbed


def median_noop(df, n=3):
    df.write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,10,30,100")
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("boilerplate-rebuild-r9")
    spark.sparkContext.setLogLevel("ERROR")
    fn, sql = ALL_QUERIES["nd_boilerplate_strip"]

    for mult in [int(m) for m in args.mults.split(",")]:
        d = (SF_DIR if mult == 1
             else build_scaled_perturbed(args.scratch, mult))
        label = "sf0.1" if mult == 1 else f"sf0.1x{mult}p"
        try:
            s = median_noop(fn(spark, d))
        except Exception as e:  # noqa: BLE001 — record the abort honestly
            print(json.dumps({"query": "nd_boilerplate_strip",
                              "scale": label,
                              "spark_s": None,
                              "error": type(e).__name__}), flush=True)
            continue
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        con.execute(sql).fetchall()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        dd = round(statistics.median(runs), 3)
        con.close()
        print(json.dumps({"query": "nd_boilerplate_strip", "scale": label,
                          "spark_s": s, "duckdb_s": dd,
                          "ratio": round(s / dd, 2)}), flush=True)


if __name__ == "__main__":
    main()
