"""Round-14 closing slice: reuse the shared minhash signature index in
the three rows that re-derived per-doc-pure signatures from raw text —
nd_neardup_decontam (bench + unmodified-train sides),
nd_incremental_minhash (corpus + re-keyed batch half) and
nd_curation_pipeline (survivor-slice signatures).

Equivalence argument (the nd_stream_band_screen precedent, r14 first
pass): signatures are PER-DOC PURE functions of text, so
filter-then-sign == sign-then-filter for any doc_id predicate, and a
re-keyed copy of UNMODIFIED text carries the original's signature row
with the new key. Only genuinely edited texts (the synthesized
leak/near-variant slices) need fresh signature computation.

This script reconstructs the PRE-change forms inline (labelled
"recompute") and A/Bs them against the registered rows at HEAD
(labelled "index"), interleaved round-robin inside ONE session
(median of N), collected-row equality asserted first, index warmed
before timing (the warm path is what every index consumer measures).

Run: python experiments/sig_index_reuse_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators.dedup import (
    _band_candidates, _band_key_exprs, _mh_sig_frame,
    LSH_BUCKET_CAP, minhash_signature_index)
from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def decontam_recompute(spark, sf_dir):
    """nd_neardup_decontam as shipped before the r14 closing slice:
    both sides re-derive signatures from raw text per call."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang",
                                                    "text")
    bench = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    leak = (docs.where(F.col("doc_id") % 20 == 0)
            .select((F.col("doc_id") + 3_000_000).alias("doc_id"), "lang",
                    F.concat("text", F.lit(" leaked benchmark copy"))
                    .alias("text")))
    train = docs.where(F.col("doc_id") % 10 != 0).unionByName(leak)
    band = F.explode(F.array(*_band_key_exprs())).alias("bkey")
    bench_idx = (_mh_sig_frame(spread_compute(spark, bench, "doc_id"))
                 .select(band).distinct())
    train_keys = (_mh_sig_frame(
        spread_compute(spark, train.select("doc_id", "text"), "doc_id"))
        .select("doc_id", band).distinct())
    flagged = (train_keys.join(F.broadcast(bench_idx), "bkey")
               .select("doc_id").distinct().withColumn("hit", F.lit(1)))
    return (train.select("doc_id", "lang")
            .join(flagged, "doc_id", "left")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.coalesce(F.sum("hit"), F.lit(0)).cast("long")
                 .alias("n_flagged"))
            .orderBy("lang"))


def incmh_recompute(spark, sf_dir):
    """nd_incremental_minhash as shipped before the r14 closing slice."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 5 != 4)
    batch = (docs.where(F.col("doc_id") % 5 == 4)
             .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
             .unionByName(
                 docs.where(F.col("doc_id") % 10 == 1).select(
                     (F.col("doc_id") + 2_000_000).alias("doc_id"),
                     F.concat(F.col("text"),
                              F.lit(" nearvariant edit")).alias("text"))))
    band = F.explode(F.array(*_band_key_exprs())).alias("bkey")
    corpus_keys = _mh_sig_frame(
        spread_compute(spark, corpus, "doc_id")).select(band)
    corpus_idx = (corpus_keys.groupBy("bkey")
                  .agg(F.count("*").alias("n"))
                  .where(F.col("n") <= LSH_BUCKET_CAP)
                  .select("bkey"))
    batch_keys = (_mh_sig_frame(spread_compute(spark, batch, "doc_id"))
                  .select("doc_id", band).distinct())
    return (batch_keys.join(corpus_idx, "bkey")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("bands_hit"))
            .orderBy("doc_id"))


def curation_recompute(spark, sf_dir):
    """nd_curation_pipeline's stage-4 signature source as shipped before
    the r14 closing slice (_mh_sig_frame over the survivor slice), full
    funnel otherwise identical — without the registered row's trailing
    localCheckpoint so both variants time plan+execute alike."""
    from bacalhau_spark.operators.curation import (fit_quality_weights,
                                                   gopher_keep,
                                                   ngram_shingle_keys,
                                                   quality_keep)
    from bacalhau_spark.operators.dedup import (cc_labels_doubling,
                                                sym_edges)

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    gated = gopher_keep(docs)
    mkept = quality_keep(gated, fit_quality_weights(spark, sf_dir))
    surv = (mkept.groupBy(F.md5("text").alias("fp"))
            .agg(F.min("doc_id").alias("doc_id")))
    sdocs = docs.join(surv.select("doc_id"), "doc_id")
    pairs = _band_candidates(_mh_sig_frame(
        spread_compute(spark, sdocs, "doc_id")))
    edges = sym_edges(pairs)
    labels = cc_labels_doubling(edges)
    kept3 = sdocs.join(
        labels.where(F.col("id") != F.col("label"))
        .select(F.col("id").alias("doc_id")), "doc_id", "left_anti")
    bench_sh = (ngram_shingle_keys(docs.where(F.col("doc_id") % 10 == 0))
                .select("sh").distinct())
    cand4 = kept3.where(F.col("doc_id") % 10 != 0)
    contam = (ngram_shingle_keys(cand4)
              .join(F.broadcast(bench_sh), "sh", "left_semi")
              .select("doc_id").distinct())
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    n_gated = gated.agg(F.count("*").cast("long").alias("n_gated"))
    n_model = mkept.agg(F.count("*").cast("long").alias("n_model"))
    n_surv = surv.agg(F.count("*").cast("long").alias("n_surv"))
    n_lab = labels.agg(
        F.count("*").cast("long").alias("n_labeled"),
        F.countDistinct("label").cast("long").alias("n_clusters"))
    n_final = (cand4.select("doc_id")
               .join(contam, "doc_id", "left_anti")
               .agg(F.count("*").cast("long").alias("n_final")))
    counts = (F.broadcast(n_docs).crossJoin(F.broadcast(n_gated))
              .crossJoin(F.broadcast(n_model))
              .crossJoin(F.broadcast(n_surv)).crossJoin(F.broadcast(n_lab))
              .crossJoin(F.broadcast(n_final)))
    kept4_cnt = (F.col("n_surv") - F.col("n_labeled")
                 + F.col("n_clusters"))
    return counts.select(F.explode(F.array(
        F.struct(F.lit("1_quality_gate").alias("stage"),
                 F.col("n_docs").alias("docs_in"),
                 F.col("n_gated").alias("docs_out")),
        F.struct(F.lit("2_model_gate").alias("stage"),
                 F.col("n_gated").alias("docs_in"),
                 F.col("n_model").alias("docs_out")),
        F.struct(F.lit("3_exact_dedup").alias("stage"),
                 F.col("n_model").alias("docs_in"),
                 F.col("n_surv").alias("docs_out")),
        F.struct(F.lit("4_neardup_clusters").alias("stage"),
                 F.col("n_surv").alias("docs_in"),
                 kept4_cnt.alias("docs_out")),
        F.struct(F.lit("5_decontam").alias("stage"),
                 kept4_cnt.alias("docs_in"),
                 F.col("n_final").alias("docs_out")),
    )).alias("s")).select("s.*").orderBy("stage")


PAIRS = [
    ("nd_neardup_decontam", decontam_recompute),
    ("nd_incremental_minhash", incmh_recompute),
    ("nd_curation_pipeline", curation_recompute),
]


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_session("sig-index-reuse-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the shared index once (the state every consumer shares).
    minhash_signature_index(spark, SF).write.mode("overwrite") \
        .format("noop").save()
    for name, recompute in PAIRS:
        head_fn, _ = ALL_QUERIES[name]
        a_rows = sorted(map(tuple, recompute(spark, SF).collect()))
        b_rows = sorted(map(tuple, head_fn(spark, SF).collect()))
        assert a_rows == b_rows, f"{name}: rows differ!"
        print(f"{name}: equality OK ({len(a_rows)} rows)")
        noop(recompute(spark, SF))
        noop(head_fn(spark, SF))
        t_a, t_b = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(recompute(spark, SF))
            t_a.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            noop(head_fn(spark, SF))
            t_b.append(time.perf_counter() - t0)
        print(f"  recompute median {statistics.median(t_a):.3f}s "
              f"min {min(t_a):.3f} max {max(t_a):.3f}")
        print(f"  index     median {statistics.median(t_b):.3f}s "
              f"min {min(t_b):.3f} max {max(t_b):.3f}")


if __name__ == "__main__":
    main()
