"""Round-6 stage-scaffolding decomposition: how much of the remaining
over-bar bench queries' time is Spark's multi-stage machinery vs
compressible physical work? (Generalizes q6_floor's single-job probe.)

Probes (all ZERO or near-zero data) measured interleaved round-robin —
a sequential per-probe loop orders the k-series behind the session's JIT
ramp and inverts it, which the first cut of this script demonstrated:

  - k1..k4: ONE-ROW frame through k−1 chained repartition(2) shuffles.
  - k{1,2,4}p32: the same at 32-task width (32k rows, numPartitions=32,
    explicit repartition(33) → AQE cannot coalesce).
  - scan32/agg32/aggsort32/join32: zero-data probes SHAPED like the
    bench queries' stage graphs with AQE active, as in the bench.
  - bcast_probe: a broadcast build job + probe stage.

Committed run (local[32], idle, sf0.1 — stage_floor_r6.txt):

    k1 0.022   k2 0.052   k3 0.050   k4 0.050      (1-row width)
    k1p32 0.075   k2p32 0.338   k4p32 0.338        (32-task width)
    scan32 0.076  agg32 0.306  aggsort32 0.345  join32 0.132
    bcast_probe 0.060
    scan task counts at sf0.1: lineitem 3, orders/events/documents 1

Findings, in order of consequence:

1. **A single full-width shuffle of NEAR-ZERO data costs 0.28-0.34 s**
   (k2p32 − k1p32): 32×33 shuffle-block streams plus 33 reduce-task
   launches. That is MORE than most bench queries cost in total — an
   empty stage scaffold at declared cluster width is already over the
   2x bar for every sub-150 ms-oracle query.
2. **The real bench queries avoid that cost by being narrow**: sf0.1
   files scan at 1-3 tasks and AQE coalesces every reduce side, so
   their actual stage graphs run 1-3-wide. Their 0.1-0.5 s totals sit
   BETWEEN the 1-row scaffold (k2 0.05) and the full-width scaffold
   (k2p32 0.34) — i.e. per-query time at sf0.1 measures scheduling
   width, not plan quality. The zero-data aggsort32 probe (0.35 s)
   EXCEEDS real q17 (0.24 s incl. 600k rows of actual aggregation).
3. Extra stages beyond the first shuffle are nearly free at fixed width
   (k2p32 ≈ k4p32, k2 ≈ k4): stage count is not the constant; stage
   WIDTH is. Cutting an exchange from a narrow plan saves ~10-30 ms —
   below run-to-run noise — which is why further plan surgery on the
   remaining over-bar relational queries cannot close their gaps at
   this scale, and why the same plans cross below DuckDB at 10-30x
   data (registry_crossover_r5/r6: minhash 0.43x, gopher 0.88x) where
   width finally carries data instead of scaffolding.

Run: python experiments/stage_floor.py [sf_dir]
Prints one JSON line with re-measured numbers on this host.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bacalhau_spark.session import get_session


def med(f, n=9):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        xs.append(time.perf_counter() - t0)
    return round(statistics.median(xs), 4), round(min(xs), 4)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def k_stage(spark, k: int, parts: int = 1):
    df = spark.range(32 * 1024 if parts > 1 else 1,
                     numPartitions=parts)
    for _ in range(k - 1):
        df = df.repartition(parts + 1 if parts > 1 else 2)
    return df.agg(F.sum("id").alias("s"))


def shaped_probes(spark) -> dict:
    """Zero-data probes shaped like the bench queries' stage graphs, with
    AQE active exactly as in the bench (explicit repartition(N) would
    bypass AQE's reduce-side coalescing and overestimate the shuffle
    constant ~5x — the first cut of this script did)."""
    base = (spark.range(32 * 1024, numPartitions=32)
            .withColumn("k", F.col("id") % 1000))
    return {
        # 1 stage: the 32-task scan itself
        "scan32": base.agg(F.sum("id").alias("s")),
        # 2 stages: hash aggregate (map + AQE-coalesced reduce) — the
        # q17/q28 shape minus their presentation sort
        "agg32": base.groupBy("k").agg(F.sum("id").alias("s"))
                     .agg(F.sum("s").alias("t")),
        # 3 stages: aggregate + range-partitioned presentation sort —
        # the full q17/q28 stage graph
        "aggsort32": base.groupBy("k").agg(F.sum("id").alias("s"))
                         .orderBy("k"),
        # 2 joined 32-task sides through one shuffle pair + agg — the
        # q18/q13 shape
        "join32": base.join(
            spark.range(1024).withColumnRenamed("id", "k2"),
            base.k == F.col("k2")).agg(F.count("*").alias("n")),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session()
    # Probes measured INTERLEAVED (round-robin, median per probe): a
    # sequential per-probe loop orders the k-series behind the session's
    # JIT ramp and inverts it — the first A/B of this script measured
    # k1 > k4 purely from warm-up order.
    small = spark.range(2).withColumnRenamed("id", "k")
    probes = {f"k{k}": k_stage(spark, k) for k in (1, 2, 3, 4)}
    # the same k-series at BENCH parallelism: 32 tasks per stage on
    # near-zero data — isolates per-stage task-launch cost at the task
    # counts the headline queries actually schedule
    probes.update({f"k{k}p32": k_stage(spark, k, parts=32)
                   for k in (1, 2, 4)})
    probes.update(shaped_probes(spark))
    # a broadcast build is its own job + barrier before the probe stage
    probes["bcast_probe"] = (spark.range(1).withColumnRenamed("id", "k")
                             .join(F.broadcast(small), "k"))
    for _ in range(4):
        for p in probes.values():
            noop(p)
    runs: dict[str, list[float]] = {name: [] for name in probes}
    for _ in range(9):
        for name, p in probes.items():
            t0 = time.perf_counter()
            noop(p)
            runs[name].append(time.perf_counter() - t0)
    out = {}
    for name, xs in runs.items():
        out[name] = round(statistics.median(xs), 4)
        out[f"{name}_min"] = round(min(xs), 4)

    # exchange counts of the headline over-bar queries (executed plans)
    from bacalhau_spark.registry import ALL_QUERIES
    counts = {}
    for q in ("q17_hash_agg", "q28_tumbling_window", "q3_shipping_priority",
              "q15_multiway_join", "tpch_q7_volume",
              "tpch_q18_large_orders"):
        fn, _ = ALL_QUERIES[q]
        df = fn(spark, sf_dir)
        noop(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts[q] = {
            "exchanges": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition"),
            "broadcasts": plan.count("BroadcastExchange"),
        }
    from bacalhau_spark.catalog import table
    parts = {t: table(spark, sf_dir, t).rdd.getNumPartitions()
             for t in ("lineitem", "orders", "events", "documents")}
    print(json.dumps({"sf_dir": sf_dir, "seconds": out,
                      "exchange_counts": counts,
                      "scan_partitions": parts}))


if __name__ == "__main__":
    main()
