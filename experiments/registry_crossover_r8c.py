"""Round-8 crossover sweep, part 3: the operators added after part 2
(registry_crossover_r8b.py), measured exactly as registered — Spark fn
vs the registry's own DuckDB oracle SQL — at sf0.1 and 10x:

- documents axis (build_scaled_perturbed): nd_bpe_merges,
  nd_skipgram_pairs, nd_zipf_octaves, nd_lang_outliers,
  nd_weighted_jaccard, and a RE-measure of nd_containment after its
  one-pass directed-explode rewrite (the r8b union form re-planned the
  pair expansion twice).
- tpch axis (build_scaled): nd_pagerank. Note the replica key-shift
  preserves (custkey, suppkey), so the distinct edge set — and the
  graph — is scale-invariant; what scales is the edge-build scan. That
  matches the production shape (the crawl grows; the host graph grows
  far slower).

Whole sweep runs under spark.driver.memory=8g (the r8b x10 batch OOM'd
the default 1g local heap; see that file's note). Median-of-3 after a
warm pass, noop sink, one JSON line per point. Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/registry_crossover_r8c.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.registry_crossover_r8 import median_runs
from experiments.scale_crossover import (SF_DIR, build_scaled,
                                         build_scaled_perturbed)

DOC_QUERIES = ("nd_bpe_merges", "nd_skipgram_pairs", "nd_zipf_octaves",
               "nd_lang_outliers", "nd_weighted_jaccard", "nd_containment")
TPCH_QUERIES = ("nd_pagerank",)


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
    ap.add_argument("--groups", default="docs,tpch")
    ap.add_argument("--skip-base", action="store_true")
    args = ap.parse_args()
    groups = set(args.groups.split(","))

    import duckdb

    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r8c")
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
        if "tpch" in groups:
            d = SF_DIR if mult == 1 else build_scaled(args.scratch, mult)
            con = duckdb.connect()
            for t in ("orders", "lineitem"):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{d}/{t}.parquet')")
            _measure(spark, con, TPCH_QUERIES, d, label)
            con.close()


if __name__ == "__main__":
    main()
