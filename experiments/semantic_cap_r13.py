"""Round-13 adversarial-skew measurement for the semantic-dedup cap
(the round-12 verdict's What's wrong #1): real encoder embeddings are
NOT sign-balanced — post-ReLU / mean-offset representations concentrate
mass in a few orthants — and the uncapped sign-bucket self-join
degraded to O(n^2) pair expansion exactly there.

Corpus: N synthetic 64-dim unit-ish vectors, SKEW_FRAC of them forced
into ONE orthant (first 16 dims positive — hot at the 8-bit key AND at
the 16-bit escalation), the rest sign-random; written as an
embeddings.parquet fixture so both plans run the registered path
shapes.

Measured:
  capped_s     nd_semantic_dedup (HEAD: escalate + cap + bucket-and-
               expand) end to end
  uncapped_s   the pre-r13 plan (8-bit-bucket equi self-join, no cap)
               inlined here verbatim — on the skewed corpus its hot
               bucket alone expands (N*SKEW_FRAC)^2/2 candidate pairs
  pairs        candidate pairs each plan evaluates a cosine for
               (the quantity the cap exists to bound)

Run: python experiments/semantic_cap_r13.py [--n 30000] [--skew 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(scratch: str, n: int, skew: float) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(scratch, f"semskew_n{n}_s{int(skew * 100)}")
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(13)
    x = rng.normal(size=(n, 64)).astype("float32")
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    hot = int(n * skew)
    # the hot orthant: first 16 dims forced positive (hot at 8 AND 16
    # sign bits — the escalation alone cannot split it)
    x[:hot, :16] = np.abs(x[:hot, :16])
    tbl = pa.table({"vec_id": pa.array(np.arange(n), type=pa.int64()),
                    "embedding": pa.array(list(x))})
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    open(marker, "w").close()
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30000)
    ap.add_argument("--skew", type=float, default=0.5)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    ap.add_argument("--skip-uncapped", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bacalhau_spark.functions import cosine
    from bacalhau_spark.operators.similarity import (SEMDEDUP_SIGN_BITS,
                                                     SEMDEDUP_TAU,
                                                     _semantic_assignment,
                                                     _semantic_bucket_model,
                                                     _semantic_bucket_rules,
                                                     SEMDEDUP_BUCKET_CAP,
                                                     nd_semantic_dedup)
    from bacalhau_spark.catalog import table
    from bacalhau_spark.session import get_session

    spark = get_session("semantic-cap-r13")
    spark.sparkContext.setLogLevel("ERROR")
    d = build_corpus(args.scratch, args.n, args.skew)
    out = {"n": args.n, "skew": args.skew}

    t0 = time.perf_counter()
    capped = nd_semantic_dedup(spark, d)
    out["capped_kept"] = capped.where("kept").count()
    out["capped_s"] = round(time.perf_counter() - t0, 2)
    # pairs the capped plan evaluates: sum over pair-generating buckets
    model = _semantic_bucket_model(spark, d)
    _hot8, excluded = _semantic_bucket_rules(model)
    counts = (_semantic_assignment(spark, d)
              .groupBy("bucket").count().collect())
    exc = set(excluded)
    out["capped_pairs"] = sum(
        r["count"] * (r["count"] - 1) // 2 for r in counts
        if r["bucket"] not in exc and r["count"] <= SEMDEDUP_BUCKET_CAP)
    out["excluded_buckets"] = len(exc)
    out["hot_orthant_members"] = int(args.n * args.skew)

    if not args.skip_uncapped:
        # the pre-r13 registered plan, verbatim (similarity.py @2994812)
        emb = table(spark, d, "embeddings").select("vec_id", "embedding")
        bucket = sum(
            (F.when(F.element_at("embedding", i + 1) >= 0,
                    F.lit(1 << i)).otherwise(F.lit(0))
             for i in range(SEMDEDUP_SIGN_BITS)),
            start=F.lit(0)).cast("int")
        b = emb.select("vec_id", bucket.alias("bucket"), "embedding")
        left = b.select(F.col("vec_id").alias("a_id"), "bucket",
                        F.col("embedding").alias("a_emb"))
        right = b.select(F.col("vec_id").alias("b_id"), "bucket",
                         F.col("embedding").alias("b_emb"))
        t0 = time.perf_counter()
        dropped = (left.join(right, "bucket")
                   .where(F.col("a_id") < F.col("b_id"))
                   .where(cosine(F.col("a_emb"), F.col("b_emb"))
                          >= SEMDEDUP_TAU)
                   .select(F.col("b_id").alias("vec_id")).distinct())
        out["uncapped_dropped"] = dropped.count()
        out["uncapped_s"] = round(time.perf_counter() - t0, 2)
        bc = (b.groupBy("bucket").count().collect())
        out["uncapped_pairs"] = sum(
            r["count"] * (r["count"] - 1) // 2 for r in bc)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
