"""A/B at x10 (r14 verdict #6): the PQ staleness monitor reading the
train-time recorded corpus baseline (pq_baseline_index, r15) vs the r14
form that recomputed the corpus term per call (full embeddings explode +
codes join + centroid join).

Builds a x10 embeddings corpus in /tmp (shifted vec_ids, production
row-group sizing), publishes the PQ index family for it once, then
interleaves session-cold monitor calls: A = new path (16-row artifact
read), B = the r14 corpus recompute stated verbatim. Values asserted
equal.

Run: python experiments/pq_base_r15.py [mult]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
SHIFT = 10_000_000


def build_scaled(mult: int) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out_dir = f"/tmp/bacalhau_spark_pqbase_x{mult}"
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    parts = []
    for i in range(mult):
        t = src
        if i:
            idx = t.schema.get_field_index("vec_id")
            t = t.set_column(idx, "vec_id",
                             pc.add(t["vec_id"], i * SHIFT))
        parts.append(t)
    merged = pa.concat_tables(parts)
    pq.write_table(merged, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=64 * 1024)
    open(marker, "w").write("ok")
    return out_dir


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    d = build_scaled(mult)
    from bacalhau_spark.catalog import table
    from bacalhau_spark.operators import similarity as S
    from bacalhau_spark.operators.dedup import clear_session_index
    from bacalhau_spark.session import get_session

    spark = get_session("pq-base-r15", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    batch = (table(spark, d, "embeddings").where(F.col("vec_id") % 97 == 3)
             .select((F.col("vec_id") + 90_000_000).alias("vec_id"),
                     F.expr("transform(embedding, v -> CAST(v AS DOUBLE) "
                            "* CAST(0.5 AS DOUBLE) + CAST(0.45 AS DOUBLE))")
                     .alias("embedding")))

    def monitor_b():
        """The r14 monitor body, corpus term recomputed per call."""
        emb = table(spark, d, "embeddings")
        cent = S.pq_centroid_index(spark, d)
        codes = S.pq_code_index(spark, d)
        e_c = S._pq_exploded(emb, persist=False)
        sq = (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
        corp = (e_c.join(codes.select("vec_id", "sub", "cid"),
                         ["vec_id", "sub"])
                .join(F.broadcast(cent), ["sub", "cid", "dim"])
                .groupBy("vec_id", "sub").agg(F.sum(sq).alias("d"))
                .groupBy("sub")
                .agg(F.count("*").cast("long").alias("n_corpus"),
                     F.sum("d").cast("long").alias("corpus_distortion")))
        e_b = S._pq_exploded(batch, persist=False)
        bagg = (e_b.join(F.broadcast(cent), ["sub", "dim"])
                .groupBy("vec_id", "sub", "cid").agg(F.sum(sq).alias("d"))
                .groupBy("vec_id", "sub")
                .agg(F.min(F.struct("d", "cid")).alias("m"))
                .select("vec_id", "sub", F.col("m.d").alias("d"))
                .groupBy("sub")
                .agg(F.count("*").cast("long").alias("n_new"),
                     F.sum("d").cast("long").alias("new_distortion")))
        stale = ((F.col("new_distortion").cast("double") / F.col("n_new"))
                 > (F.lit(S.PQ_STALENESS_FACTOR)
                    * F.col("corpus_distortion").cast("double")
                    / F.col("n_corpus")))
        return (corp.join(bagg, "sub")
                .select(F.col("sub").cast("int").alias("sub"),
                        "n_corpus", "corpus_distortion",
                        "n_new", "new_distortion", stale.alias("stale"))
                .orderBy("sub"))

    # publish the index family + the baseline once (train time)
    t0 = time.perf_counter()
    S.pq_baseline_index(spark, d).write.mode("overwrite") \
        .format("noop").save()
    print(f"x{mult}: index family + baseline publish (one-shot train): "
          f"{time.perf_counter() - t0:.2f}s")

    a_runs, b_runs = [], []
    for _ in range(5):
        clear_session_index(spark)  # session tier only; store stays
        t0 = time.perf_counter()
        S.pq_staleness(spark, d, batch).write.mode("overwrite") \
            .format("noop").save()
        a_runs.append(time.perf_counter() - t0)

        clear_session_index(spark)
        t0 = time.perf_counter()
        monitor_b().write.mode("overwrite").format("noop").save()
        b_runs.append(time.perf_counter() - t0)
    print(f"A r15 baseline-artifact monitor: {[round(t,2) for t in a_runs]}"
          f" median {statistics.median(a_runs):.2f}s")
    print(f"B r14 corpus-recompute monitor:  {[round(t,2) for t in b_runs]}"
          f" median {statistics.median(b_runs):.2f}s")

    a_rows = sorted(map(tuple, S.pq_staleness(spark, d, batch).collect()))
    b_rows = sorted(map(tuple, monitor_b().collect()))
    assert a_rows == b_rows, "baseline-artifact monitor diverges"
    print(f"value equality: OK ({len(a_rows)} subspace rows)")


if __name__ == "__main__":
    main()
