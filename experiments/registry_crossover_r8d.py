"""Round-8 crossover sweep, part 4: the last three round-8 operators —
nd_k_anonymity (documents, perturbed builder), nd_target_encode (orders,
key-shifted builder), nd_ewma_smooth (events, shifted-user builder: more
users, constant per-user history — so the per-key fold state is constant
and the growth axis is group COUNT, the honest telemetry shape) — at
sf0.1 and 10x, measured as registered (Spark fn vs their own DuckDB
oracle). Same protocol as parts 1-3 (median-of-3 after warm, noop sink,
8 GB heap for the x10 batch). Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/registry_crossover_r8d.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover_r8 import (build_scaled_events,
                                               median_runs)
from experiments.scale_crossover import (SF_DIR, build_scaled,
                                         build_scaled_perturbed)


def _measure(spark, con, name, d, label):
    from bacalhau_spark.registry import ALL_QUERIES

    fn, sql = ALL_QUERIES[name]
    s = median_runs(lambda: fn(spark, d)
                    .write.mode("overwrite").format("noop").save())
    row = {"query": name, "scale": label, "spark_s": s}
    if sql is not None:
        dd = median_runs(lambda: con.execute(sql).fetchall())
        row.update(duckdb_s=dd, ratio=round(s / dd, 2))
    print(json.dumps(row), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r8d")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        docs_d = (SF_DIR if mult == 1
                  else build_scaled_perturbed(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_d}/documents.parquet')")
        _measure(spark, con, "nd_k_anonymity", docs_d, label + "p")
        con.close()

        tpch_d = SF_DIR if mult == 1 else build_scaled(args.scratch, mult)
        con = duckdb.connect()
        con.execute("CREATE VIEW orders AS SELECT * FROM "
                    f"read_parquet('{tpch_d}/orders.parquet')")
        _measure(spark, con, "nd_target_encode", tpch_d, label)
        con.close()

        ev_d = (SF_DIR if mult == 1
                else build_scaled_events(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{ev_d}/events.parquet')")
        _measure(spark, con, "nd_ewma_smooth", ev_d, label + "u")
        con.close()


if __name__ == "__main__":
    main()
