"""Round-14 closing slice: the PMI localCheckpoint convention applied
to the three remaining rows whose REDUCED per-doc count frame feeds
multiple DataFrame branches (Spark shares no subplans, so the
explode/hash+count lineage re-ran per branch — the exact shape
nd_pmi_collocations had before its r14 fix):

- nd_bigram_surprisal: db (doc,bigram,c) feeds bfreq + ctx + main (x3)
- nd_word_rarity: dw (doc,word,c) feeds freq + main (x2), and `total`
  re-tokenized the corpus a third time — SUM(c) over dw is the same
  integer, so the registered row now derives t from the checkpointed
  frame
- nd_chunk_dedup: dc (doc,ch,c) feeds freq + main (x2; the md5-chunk
  HOF lineage is the expensive half)

This script reconstructs the PRE-change forms inline (labelled
"recompute") and A/Bs them against the registered rows at HEAD
(labelled "ckpt"), interleaved round-robin inside ONE session (median
of N), collected-row equality asserted first.

Run: python experiments/count_frame_ckpt_r14.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.catalog import spread_compute, table
from bacalhau_spark.operators.dedup import CHUNK_WORDS
from bacalhau_spark.operators.text import words
from bacalhau_spark.registry import ALL_QUERIES
from bacalhau_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark):
    return spread_compute(spark, table(spark, SF, "documents")
                          .select("doc_id", "text"), "doc_id")


def surprisal_recompute(spark, sf_dir):
    """nd_bigram_surprisal as shipped before the r14 closing slice."""
    docs = _docs(spark)
    w = words("text")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    bg = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    db = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    bfreq = db.groupBy("bigram").agg(F.sum("c").alias("c12"))
    ctx = (db.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
           .agg(F.sum("c").alias("c1")))
    return (
        db.join(bfreq, "bigram")
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_bigrams"),
             F.sum(F.col("c") * F.expr("c1 div c12"))
             .cast("long").alias("surprisal_sum"))
        .orderBy("doc_id")
    )


def rarity_recompute(spark, sf_dir):
    """nd_word_rarity as shipped before the r14 closing slice (separate
    third tokenize pass for the grand total)."""
    docs = _docs(spark)
    wordsdf = docs.select("doc_id", F.explode(words("text")).alias("word"))
    dw = wordsdf.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    freq = dw.groupBy("word").agg(F.sum("c").alias("f"))
    total = (docs.select(F.size(words("text")).alias("n"))
             .agg(F.sum("n").cast("long").alias("t")))
    return (
        dw.join(freq, "word")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_words"),
             F.sum(F.col("c") * F.expr("t div f")).alias("rarity_sum"))
        .orderBy("doc_id")
    )


def chunk_recompute(spark, sf_dir):
    """nd_chunk_dedup as shipped before the r14 closing slice."""
    docs = _docs(spark)
    w = docs.select("doc_id", words("text").alias("w"))
    n_chunks = F.ceil(F.size("w") / CHUNK_WORDS).cast("int")
    chunk_hash = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.conv(F.substring(F.md5(F.concat_ws(
            " ", F.slice(F.col("w"), i * CHUNK_WORDS + 1, CHUNK_WORDS))),
            1, 15), 16, 10).cast("long"))
    chunks = w.select("doc_id", F.explode(chunk_hash).alias("ch"))
    dc = chunks.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    freq = dc.groupBy("ch").agg(F.sum("c").alias("f"))
    return (
        dc.join(freq, "ch")
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_chunks"),
             F.sum(F.when(F.col("f") > 1, F.col("c")).otherwise(0))
             .cast("long").alias("dup_chunks"))
        .orderBy("doc_id")
    )


PAIRS = [
    ("nd_bigram_surprisal", surprisal_recompute),
    ("nd_word_rarity", rarity_recompute),
    ("nd_chunk_dedup", chunk_recompute),
]


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_session("count-ckpt-ab")
    spark.sparkContext.setLogLevel("ERROR")
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
        print(f"  ckpt      median {statistics.median(t_b):.3f}s "
              f"min {min(t_b):.3f} max {max(t_b):.3f}")


if __name__ == "__main__":
    main()
