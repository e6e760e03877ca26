"""Round-8 crossover sweep, part 2: the round-8 operators the first
sweep (registry_crossover_r8.py) did not cover, measured EXACTLY as
registered — Spark fn vs the registry's own DuckDB oracle SQL — at
sf0.1 and 10x/30x:

- documents axis (build_scaled_perturbed): nd_neardup_decontam,
  nd_heavy_hitters_cms, nd_stream_heavy_hitters, nd_bigram_surprisal,
  nd_pmi_collocations, nd_ks_drift, nd_containment
- embeddings axis (build_scaled_embeddings): nd_embedding_covariance,
  nd_pca_project (no oracle — Spark time only, vs the covariance twin)

Reuses the part-1 harness verbatim (median-of-3 after warm, noop sink,
one JSON line per point). Run:
    python experiments/registry_crossover_r8b.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover_r8 import median_runs
from experiments.scale_crossover import (SF_DIR, build_scaled_embeddings,
                                         build_scaled_perturbed)

DOC_QUERIES = ("nd_neardup_decontam", "nd_heavy_hitters_cms",
               "nd_stream_heavy_hitters", "nd_bigram_surprisal",
               "nd_pmi_collocations", "nd_ks_drift", "nd_containment")
EMB_QUERIES = ("nd_embedding_covariance", "nd_pca_project")


def _measure(spark, con, names, d, label):
    from bacalhau_spark.registry import ALL_QUERIES

    for name in names:
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
    ap.add_argument("--skip-base", action="store_true")
    ap.add_argument("--groups", default="docs,emb")
    args = ap.parse_args()
    groups = set(args.groups.split(","))

    import duckdb

    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r8b")
    spark.sparkContext.setLogLevel("ERROR")

    scales = [] if args.skip_base else [("sf0.1", 1)]
    scales.append((f"sf0.1x{args.mult}", args.mult))
    for label, mult in scales:
        if "docs" in groups:
            d = (SF_DIR if mult == 1
                 else build_scaled_perturbed(args.scratch, mult))
            con = duckdb.connect()
            con.execute("CREATE VIEW documents AS SELECT * FROM "
                        f"read_parquet('{d}/documents.parquet')")
            _measure(spark, con, DOC_QUERIES, d, label + "p")
            con.close()
        if "emb" in groups:
            d = (SF_DIR if mult == 1
                 else build_scaled_embeddings(args.scratch, mult))
            con = duckdb.connect()
            con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                        f"read_parquet('{d}/embeddings.parquet')")
            _measure(spark, con, EMB_QUERIES, d, label)
            con.close()


if __name__ == "__main__":
    main()
