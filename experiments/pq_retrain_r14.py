"""Round-14 artifact: the PQ staleness RETRAIN LOOP, measured.

Scenario: epoch N = the fixture embeddings corpus, with its PQ codebook
trained and published. Epoch N+1 appends a drifted batch (a mean-offset
distribution shift). The monitor flags the increment stale; pq_refresh
retrains over the merged corpus. Recorded per drift shape:

  1. the flag fires (stale subspaces under the pinned codebook),
  2. the SIGNAL CLEARS after retrain: re-running the monitor with the
     same batch against the RETRAINED merged epoch reads 0/16 stale —
     the closed-loop property (the retrain consumed the signal),
  3. recall@3 vs exact brute force for the drifted queries under the
     pinned codebook (ignore-the-flag counterfactual) vs the published
     post-refresh state — which equals the FRESH-TRAIN level by
     construction (the retrain IS the standard trainer over the merged
     corpus; the test suite asserts output identity),
  4. the refresh cost in seconds.

TWO HONEST FINDINGS, both recorded below:
- (3) is shape/scale luck: a mean-offset batch is a cluster whose true
  cosine neighbors differ only in fine structure; 16 centroids/subspace
  give the cluster ~1-3 cells under EITHER codebook, so rank-3 margins
  are noise (measured both directions across sf/shape). Recall parity
  with a from-scratch index is exactly what "retrain" can promise.
- (2) distinguishes staleness from CAPACITY: the tight monitor shape
  (0.5x+0.45) clears to 0/16 after one retrain; the broad shape
  (0.9x+0.35, spread comparable to the corpus's own) stays stale at
  PQ_K=16 — the monitor is then reporting that the codebook lacks
  capacity for a second corpus-sized mode, not that another retrain
  would help. An operator seeing a post-retrain stale signal should
  raise K (or split the index), not loop.

Usage: python experiments/pq_retrain_r14.py [sf_dir] [shortlist]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bacalhau_spark.session import get_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    shortlist = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_session("pq-retrain-r14", master="local[8]",
                        shuffle_partitions=8)
    from bacalhau_spark.operators.dedup import (_index_table_root,
                                                clear_session_index)
    from bacalhau_spark.operators.similarity import (
        _pq_drift_batch, _pq_exploded, adc_topk, cosine,
        pq_centroid_index, pq_code_index, pq_refresh,
        pq_retrain_drift_batch, pq_staleness)

    work = tempfile.mkdtemp(prefix="pq_retrain_")
    parent = os.path.join(work, "parent")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.select("vec_id", "embedding").coalesce(2).write.parquet(
        os.path.join(parent, "embeddings.parquet"))

    t0 = time.time()
    pq_code_index(spark, parent).count()
    pq_centroid_index(spark, parent).count()
    t_train_parent = time.time() - t0
    store_roots = [_index_table_root(parent, k, "embeddings")
                   for k in ("pq_assign", "pq_cent")]

    def measure(tag, drift):
        mon = pq_staleness(spark, parent, drift).collect()
        n_stale = sum(1 for r in mon if r["stale"])
        merged = os.path.join(work, "merged_" + tag)
        (spark.read.parquet(os.path.join(parent, "embeddings.parquet"))
         .unionByName(drift).coalesce(2)
         .write.parquet(os.path.join(merged, "embeddings.parquet")))
        m_emb = spark.read.parquet(
            os.path.join(merged, "embeddings.parquet"))
        drift_ids = [r["vec_id"] for r in drift.select("vec_id")
                     .orderBy("vec_id").limit(20).collect()]
        qp = F.col("vec_id").isin(drift_ids)
        q = m_emb.where(qp).select(F.col("vec_id").alias("qid"),
                                   F.col("embedding").alias("q_emb"))
        c = m_emb.select(F.col("vec_id").alias("nn"),
                         F.col("embedding").alias("c_emb"))
        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nn"))
        truth = (F.broadcast(q).join(c, F.col("qid") != F.col("nn"))
                 .select("qid", "nn", cosine(F.col("q_emb"),
                                             F.col("c_emb")).alias("cos"))
                 .withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= 3).select("qid", "nn"))
        tset = {(r["qid"], r["nn"]) for r in truth.collect()}

        def recall(codes, cent):
            got = adc_topk(m_emb, codes, cent, qp,
                           shortlist=shortlist).select("vec_id", "nn")
            gset = {(r["vec_id"], r["nn"]) for r in got.collect()}
            return len(gset & tset) / len(tset)

        # (a) pinned: the adopt-path state (parent codes + pinned-
        # encoded batch) — what serving traffic sees if the flag is
        # ignored
        cent_p = pq_centroid_index(spark, parent)
        sq = (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
        e_b = _pq_exploded(drift, persist=False)
        new_codes = (e_b.join(F.broadcast(cent_p), ["sub", "dim"])
                     .groupBy("vec_id", "sub", "cid")
                     .agg(F.sum(sq).alias("d"))
                     .groupBy("vec_id", "sub")
                     .agg(F.min(F.struct("d", "cid")).alias("m"))
                     .select("vec_id", "sub", F.col("m.cid").alias("cid"),
                             F.col("m.d").alias("d")))
        r_pinned = recall(
            pq_code_index(spark, parent).unionByName(new_codes), cent_p)

        # (b) the retrain loop: pq_refresh consumes the flag
        t0 = time.time()
        out = pq_refresh(spark, merged, parent).collect()
        t_refresh = time.time() - t0
        action = out[0]["action"] if out else "no_new_rows"
        r_after = recall(pq_code_index(spark, merged),
                         pq_centroid_index(spark, merged))
        # closed loop: the same batch against the RETRAINED epoch (the
        # monitor never joins batch ids against the corpus, so passing
        # the identical frame is the honest re-read of the signal)
        mon2 = pq_staleness(spark, merged, drift).collect()
        n_stale2 = sum(1 for r in mon2 if r["stale"])
        store_roots.extend(_index_table_root(merged, k, "embeddings")
                           for k in ("pq_assign", "pq_cent"))
        print(f"[{tag}] stale {n_stale}/16 -> action={action}; "
              f"signal after retrain: {n_stale2}/16 stale; "
              f"recall@3(sl={shortlist}) pinned={r_pinned:.3f} "
              f"after-refresh={r_after:.3f} (== fresh-train level); "
              f"refresh={t_refresh:.2f}s")

    print(f"sf={sf_dir} shortlist={shortlist} "
          f"parent_train={t_train_parent:.2f}s")
    measure("tight_shape_closedloop", _pq_drift_batch(spark, parent))
    measure("broad_shape_capacity", pq_retrain_drift_batch(spark, parent))

    clear_session_index(spark, persisted=False)
    for root in store_roots:
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
