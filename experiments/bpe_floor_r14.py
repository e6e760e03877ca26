"""Round-14: nd_bpe_pair_count decomposition (r13 verdict #6 — the one
carried weak row with scale headroom: 3.5x DuckDB at x10, bench spread
0.24-1.93 s).

Three candidate plans, results asserted identical, timed interleaved
(5 reps, median) in one session; DuckDB runs the registered oracle SQL
on the same files:

  vocab   (shipped) corpus -> word-frequency vocabulary (one word-keyed
          shuffle, map-side combined) -> pair explosion over DISTINCT
          words weighted by counts -> 1k-key pair aggregate
  direct  flatten(transform(words, w -> pairs(w))) per document -> pair
          aggregate (tiny shuffle, but the nested HOF runs interpreted
          per element over every OCCURRENCE)
  twoexp  explode words -> explode per-occurrence pairs -> pair
          aggregate (codegen explodes, tiny shuffle, but the substr
          chain still runs per occurrence)

Run: python experiments/bpe_floor_r14.py [sf_dir]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from bacalhau_spark.functions import words  # noqa: E402
from bacalhau_spark.session import get_session  # noqa: E402

PAIR_TOP_K = 20


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("bpe-floor-r14",
                        extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    pair_arr = F.when(
        F.length("word") >= 2,
        F.transform(F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))

    def vocab_form():
        vocab = (docs.select(F.explode(words("text")).alias("word"))
                 .groupBy("word").agg(F.count("*").alias("cnt")))
        return (vocab.select("cnt", F.explode(pair_arr).alias("pair"))
                .groupBy("pair").agg(F.sum("cnt").cast("int").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(PAIR_TOP_K))

    def direct_form():
        w = words("text")
        pairs = F.flatten(F.transform(
            w, lambda word: F.when(
                F.length(word) >= 2,
                F.transform(F.sequence(F.lit(1), F.length(word) - 1),
                            lambda i: word.substr(i, F.lit(2))))
            .otherwise(F.array().cast("array<string>"))))
        return (docs.select(F.explode(pairs).alias("pair"))
                .groupBy("pair").agg(F.count("*").cast("int").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(PAIR_TOP_K))

    def twoexp_form():
        return (docs.select(F.explode(words("text")).alias("word"))
                .select(F.explode(pair_arr).alias("pair"))
                .groupBy("pair").agg(F.count("*").cast("int").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair"))
                .limit(PAIR_TOP_K))

    forms = {"vocab": vocab_form, "direct": direct_form,
             "twoexp": twoexp_form}
    base = None
    for name, fn in forms.items():
        got = sorted(map(tuple, fn().collect()))
        if base is None:
            base = got
        assert got == base, name
    times = {n: [] for n in forms}
    for _ in range(5):
        for n, fn in forms.items():
            t0 = time.perf_counter()
            fn().collect()
            times[n].append(time.perf_counter() - t0)
    import duckdb
    con = duckdb.connect()
    src = os.path.join(sf, "documents.parquet")
    glob = src + "/*.parquet" if os.path.isdir(src) else src
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{glob}')")
    import __spark_entry__ as E
    sql = E.oracle_sql()["nd_bpe_pair_count"]
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dts.append(time.perf_counter() - t0)
    line = " ".join(
        f"{n}={statistics.median(ts):.3f}(min {min(ts):.3f})"
        for n, ts in times.items())
    print(f"{sf}: {line} duckdb={statistics.median(dts):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
