"""The informative scaling axis (r14 verdict #3): at sf0.1 the headline
rows sit on the scheduler floor, so the driver's 8-core/32-core ratios
read ~1 and say nothing about parallelism. This experiment measures the
SAME queries at x10 (production row-group sizing, key-shifted replicas
of every non-dim table) where work dominates the floor, one fresh
process per core count ($SPARK_GRAFT_CPUS -> local[N], exactly the
driver's lever).

Build + orchestrate:  python experiments/scaling_axis_r15.py
Probe (one process):  SPARK_GRAFT_CPUS=8 python ... probe
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = "/tmp/bacalhau_spark_scale_r15/x10"
MULT = 10
ROW_GROUP_ROWS = 64 * 1024
# table -> key columns shifted per replica (dims copied verbatim)
REPLICATED = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}
DIMS = ("region", "nation", "customer", "supplier", "part")
SHIFT = 100_000_000

ROWS = ("q17_hash_agg", "q04_math_funcs", "tpch_q7_volume",
        "nd_substr_dedup", "nd_kmeans", "nd_grouped_python")
COLD_ROWS = ("nd_video_phash",)


def build() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = os.path.join(SCRATCH, "_READY")
    if os.path.exists(marker):
        return
    os.makedirs(SCRATCH, exist_ok=True)
    for name, keys in REPLICATED.items():
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        parts = []
        for i in range(MULT):
            t = src
            for k in keys:
                if i:
                    idx = t.schema.get_field_index(k)
                    t = t.set_column(idx, k, pc.add(t[k], i * SHIFT))
            parts.append(t)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(SCRATCH, f"{name}.parquet"),
                       row_group_size=ROW_GROUP_ROWS)
        print(f"built {name} x{MULT}")
    for name in DIMS:
        t = pq.read_table(f"{SF_DIR}/{name}.parquet")
        pq.write_table(t, os.path.join(SCRATCH, f"{name}.parquet"))
    open(marker, "w").write("ok")


def probe() -> None:
    from bacalhau_spark.operators.dedup import clear_session_index
    from bacalhau_spark.registry import ALL_QUERIES
    from bacalhau_spark.session import get_session

    spark = get_session("scaling-axis-r15", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    from pyspark.sql import functions as F
    trivial = spark.range(1).agg(F.sum("id").alias("s"))
    for _ in range(2):
        noop(trivial)
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        noop(trivial)
        floors.append(time.perf_counter() - t0)

    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS"),
           "floor_s": round(statistics.median(floors), 4), "rows": {}}
    for name in ROWS:
        fn, _ = ALL_QUERIES[name]
        noop(fn(spark, SCRATCH))  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            noop(fn(spark, SCRATCH))
            runs.append(time.perf_counter() - t0)
        out["rows"][name] = round(statistics.median(runs), 3)
    for name in COLD_ROWS:
        fn, _ = ALL_QUERIES[name]
        runs = []
        for _ in range(3):
            clear_session_index(spark, persisted=True)
            t0 = time.perf_counter()
            noop(fn(spark, SCRATCH))
            runs.append(time.perf_counter() - t0)
        out["rows"][name + "_cold"] = round(statistics.median(runs), 3)
    print("PROBE " + json.dumps(out))


def main() -> None:
    build()
    results = {}
    for cpus in ("32", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "probe"],
            env=env, capture_output=True, text=True, timeout=3000)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("PROBE ")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"probe at {cpus} cpus failed")
        results[cpus] = json.loads(line[0][6:])
    r32, r8 = results["32"], results["8"]
    print(f"\nfloors: 32c {r32['floor_s']}s, 8c {r8['floor_s']}s")
    print(f"{'row':26s} {'32c':>8s} {'8c':>8s} {'ratio':>6s} "
          f"{'floor-adj ratio':>15s}")
    for name, t32 in r32["rows"].items():
        t8 = r8["rows"][name]
        adj = ((t8 - r8["floor_s"]) / max(t32 - r32["floor_s"], 1e-9))
        print(f"{name:26s} {t32:8.2f} {t8:8.2f} {t8 / t32:6.2f} "
              f"{adj:15.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        probe()
    else:
        main()
