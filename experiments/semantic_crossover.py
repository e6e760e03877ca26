"""Embedding-family crossover: nd_semantic_dedup run EXACTLY as
registered (Spark fn vs its own DuckDB oracle SQL) against mult×
embeddings with the distinct-bucket sign perturbation
(scale_crossover.build_scaled_embeddings — replicas occupy different
sign buckets, so within-bucket candidate pairs grow LINEARLY; an
unperturbed replication would be the quadratic degenerate fixture).

Run: python experiments/semantic_crossover.py [--mults 10,30]
Prints one JSON line per (query, scale). Committed run:
semantic_crossover_r6.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover import median_runs
from experiments.scale_crossover import (SF_DIR, build_scaled_embeddings)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="10,30")
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("semantic-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    fn, sql = ALL_QUERIES["nd_semantic_dedup"]

    scales = [("sf0.1", SF_DIR)]
    for m in (int(x) for x in args.mults.split(",") if x):
        scales.append((f"sf0.1x{m}p",
                       build_scaled_embeddings(args.scratch, m)))
    for label, d in scales:
        con = duckdb.connect()
        con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{d}/embeddings.parquet')")
        s = median_runs(lambda: fn(spark, d)
                        .write.mode("overwrite").format("noop").save())
        dd = median_runs(lambda: con.execute(sql).fetchall())
        print(json.dumps({"query": "nd_semantic_dedup", "scale": label,
                          "spark_s": s, "duckdb_s": dd,
                          "ratio": round(s / dd, 2)}))
        con.close()


if __name__ == "__main__":
    main()
