"""Round-9 crossover sweep: the new/rebuilt operators at sf0.1 and 10x
(30x where the fixture builder supports it) — nd_cc_doubling (pointer-
jumping CC, perturbed docs), nd_bpe_encode (train+apply BPE, perturbed
docs), nd_ann_pca (PCA-reduced ANN over scaled embeddings; no oracle —
wall time + recall@3 vs the scaled brute force), nd_pca_project
(exploded projection, scaled embeddings; no oracle — wall time only).
Protocol as parts r8a-d: median-of-3 after warm, noop sink, 8 GB heap.
Run:
    PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
        python experiments/registry_crossover_r9.py [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import (SF_DIR, build_scaled_embeddings,
                                         build_scaled_perturbed)


def median_noop(build, n=3):
    """Times BUILD + materialize per run: nd_cc_doubling / nd_bpe_encode
    do their iterative work at plan-build time (eager localCheckpoint),
    so timing a prebuilt frame would measure only a checkpoint re-save —
    the first cut of this sweep recorded exactly that artifact (0.01x
    'ratios'). `build` is a zero-arg callable returning a fresh frame."""
    build().write.mode("overwrite").format("noop").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def _oracle_vs(spark, con, name, d, label):
    from bacalhau_spark.registry import ALL_QUERIES

    fn, sql = ALL_QUERIES[name]
    s = median_noop(lambda: fn(spark, d))
    row = {"query": name, "scale": label, "spark_s": s}
    if sql is not None:
        con.execute(sql).fetchall()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        dd = round(statistics.median(runs), 3)
        row.update(duckdb_s=dd, ratio=round(s / dd, 2))
    print(json.dumps(row), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("registry-crossover-r9")
    spark.sparkContext.setLogLevel("ERROR")

    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        docs_d = (SF_DIR if mult == 1
                  else build_scaled_perturbed(args.scratch, mult))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{docs_d}/documents.parquet')")
        _oracle_vs(spark, con, "nd_cc_doubling", docs_d, label + "p")
        _oracle_vs(spark, con, "nd_bpe_encode", docs_d, label + "p")
        _oracle_vs(spark, con, "nd_curation_pipeline", docs_d, label + "p")
        con.close()

        emb_d = (SF_DIR if mult == 1
                 else build_scaled_embeddings(args.scratch, mult))
        fn_pca, _ = ALL_QUERIES["nd_pca_project"]
        print(json.dumps({"query": "nd_pca_project", "scale": label + "e",
                          "spark_s": median_noop(
                              lambda: fn_pca(spark, emb_d))}),
              flush=True)
        fn_ann, _ = ALL_QUERIES["nd_ann_pca"]
        s = median_noop(lambda: fn_ann(spark, emb_d))
        # recall@3 vs the scaled brute force (vec_id < 20 queries exist
        # in every replica set; truth re-derived on the same dir)
        fn_truth, _ = ALL_QUERIES["nd_ann_topk"]
        truth = {(r["vec_id"], r["nn"])
                 for r in fn_truth(spark, emb_d).collect()}
        got = {(r["vec_id"], r["nn"])
               for r in fn_ann(spark, emb_d).collect()}
        print(json.dumps({"query": "nd_ann_pca", "scale": label + "e",
                          "spark_s": s,
                          "recall_at_3": round(len(truth & got)
                                               / len(truth), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
