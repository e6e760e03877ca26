"""q13 floor proof (round-8; closes the last recurring bench-set cliff).

q13_join_agg = customer scan (1 task at sf0.1) + broadcast nation +
25-group count + orderBy. Its DuckDB oracle is ~7 ms, so the raw ratio
(~30x) is the worst in the bench set every round, and every round the
same question recurs: is there a removable plan element?

Method (stage-scaffolding, as stage_floor.py): run q13 INTERLEAVED with
a NEAR-ZERO-DATA scaffold with exactly q13's stage graph — parquet scan
of ONE row, broadcast hash join against a 25-row inline literal dim,
partial+final hash aggregate, orderBy, noop sink, AQE on. The scaffold
does no measurable query work; whatever it costs is the irreducible
scheduling/codegen price of q13's SHAPE on this Spark. If
scaffold_s ≈ q13_s, there is no cut: q13's time IS its shape's floor,
and the gap vs a 7 ms embedded oracle is the local-mode constant the
BASELINE §5 policy already prices (it vanishes into data at scale — the
same broadcast+partial-agg plan is exactly what 100 TB wants).

Run: python experiments/q13_floor.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from bacalhau_spark.operators.joins import q13_join_agg
    from bacalhau_spark.session import get_session

    spark = get_session("q13-floor")
    spark.sparkContext.setLogLevel("ERROR")

    one_row = "/tmp/q13_floor_one_row.parquet"
    spark.range(1).select(F.lit(7).alias("k")).write.mode(
        "overwrite").parquet(one_row)

    def scaffold():
        fact = spark.read.parquet(one_row)
        # inline literal relation, not a Python-RDD scan
        dim = spark.sql(
            "SELECT inline(array({})) AS (k, name)".format(",".join(
                f"struct({i}, 'n{i}')" for i in range(25))))
        return (fact.join(F.broadcast(dim), "k")
                .groupBy("name").agg(F.count("*").alias("c"))
                .orderBy("name"))

    def q13():
        return q13_join_agg(spark, SF_DIR)

    variants = {"scaffold_1row": scaffold, "q13_real": q13}
    for v in variants.values():  # warm
        v().write.mode("overwrite").format("noop").save()
    times = {k: [] for k in variants}
    for _ in range(5):  # interleaved round-robin
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.mode("overwrite").format("noop").save()
            times[k].append(time.perf_counter() - t0)
    out = {k: round(statistics.median(ts), 4) for k, ts in times.items()}
    out["marginal_s"] = round(out["q13_real"] - out["scaffold_1row"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
