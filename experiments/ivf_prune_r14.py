"""Round-14: the IVF inverted file MEASURABLY prunes the probe scan.

nd_ann_ivf has claimed since its first round that "at 100 TB the corpus
is hash-partitioned/bucketed by cell, so a query touches NPROBE/K of
the data" — plan-shape argument only. Round 14 publishes the inverted
file itself (ivf_vectors_index: (cluster, vec_id, embedding),
range-CLUSTERED on cell id via write_version cluster_by), so the
manifest's per-file cell ranges let a probe's `cluster in (...)`
predicate skip files before spark.read ever sees them
(versioned.read_version + the new `in` op). nd_ann_ivf_pruned is the
graded row over that path (same oracle as nd_ann_ivf — identical rows,
different gather).

Protocol: at each corpus width (sf0.1 embeddings replicated --mult x,
vec_ids offset per replica, written as `mult` part files; the inverted
file gets 32 output files at scaled widths so files-per-cell > 1):
  1. build the quantizer + cells + inverted file (one ingest, timed);
  2. per single query (first 8 query ids), rank its NPROBE=4 probe
     cells and record kept/total FILES and kept/total BYTES for the
     membership predicate — the measured scan fraction;
  3. time the candidate GATHER both ways, warm, 3 reps median:
     pruned (selective read_version) vs full (read everything, row
     filter) — the same frame both ways, .count() materializes it;
  4. at the smallest width, assert pruned rows == full rows exactly.

Run:  python experiments/ivf_prune_r14.py --mult 1    (fixture as-is)
      python experiments/ivf_prune_r14.py --mult 100
      python experiments/ivf_prune_r14.py --mult 1000  (16g heap)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_ivf_prune")
    ap.add_argument("--target-mb", type=int, default=None,
                    help="override IVF_VEC_TARGET_BYTES (MB) to force "
                         "the >K composite-key layout at small widths")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bacalhau_spark.operators import similarity as S
    from bacalhau_spark.operators.dedup import _index_table_root
    from bacalhau_spark.session import get_session
    from bacalhau_spark.sources import versioned

    store = os.path.join(args.scratch, "store")
    os.environ["SPARK_GRAFT_INDEX_STORE"] = store
    shutil.rmtree(store, ignore_errors=True)
    if args.target_mb:
        S.IVF_VEC_TARGET_BYTES = args.target_mb * 1024 * 1024
    heap = "16g" if args.mult >= 1000 else "8g"
    spark = get_session("ivf-prune-r14", master="local[32]",
                        shuffle_partitions=32,
                        extra_conf={"spark.driver.memory": heap})

    # ---- scaled corpus: replicate embeddings, offset vec_ids ---------
    if args.mult == 1:
        corpus = args.sf_dir
    else:
        corpus = os.path.join(args.scratch, f"x{args.mult}")
        if not os.path.exists(os.path.join(corpus, "embeddings.parquet")):
            os.makedirs(corpus, exist_ok=True)
            base = spark.read.parquet(
                os.path.join(args.sf_dir, "embeddings.parquet"))
            n = base.count()
            reps = spark.range(args.mult).select(
                F.col("id").alias("rep"))
            scaled = (base.crossJoin(reps)
                      .select((F.col("vec_id")
                               + F.col("rep") * n).alias("vec_id"),
                              *[c for c in base.columns
                                if c != "vec_id"]))
            (scaled.repartition(args.mult, "vec_id")
             .write.mode("overwrite")
             .parquet(os.path.join(corpus, "embeddings.parquet")))
        # file count auto-scales: max(K, source_bytes/target) — single
        # cell-aligned key at <=K files, composite (cluster, vec_id)
        # beyond (see similarity._ivf_vec_layout)

    # ---- ingest: quantizer + cells + inverted file -------------------
    t0 = time.time()
    S.ivf_coarse_index(spark, corpus)
    S.ivf_cells_index(spark, corpus).count()
    S.ivf_vectors_index(spark, corpus).count()
    t_ingest = time.time() - t0
    root = _index_table_root(corpus, "ivf_vectors", "embeddings",
                             rev=S.IVF_REV)
    man = versioned.latest_manifest(root)
    assert man and man["files"], "inverted file did not publish"
    sizes = {p: os.path.getsize(os.path.join(root, p))
             for p in man["files"]}
    total_bytes = sum(sizes.values())

    # ---- per-query probe: measured scan fraction ---------------------
    rows = S._coarse_rows(spark, corpus)
    emb = spark.read.parquet(os.path.join(corpus, "embeddings.parquet"))
    probe_rows = (emb.where(F.col("vec_id") < 8)
                  .select("vec_id",
                          S._probe_cells_expr(rows, S.NPROBE)
                          .alias("cells")).collect())
    fracs_files, fracs_bytes = [], []
    for r in probe_rows:
        cells = tuple(int(c) for c in r["cells"])
        pred = [("cluster", "in", cells)]
        kept, total = versioned.pruned_file_count(root, pred)
        stats = man.get("stats", {})
        kept_b = sum(sizes[p] for p in man["files"]
                     if versioned._file_may_match(stats.get(p, {}), pred))
        fracs_files.append((kept, total))
        fracs_bytes.append(kept_b / total_bytes)

    # ---- gather timing: pruned vs full, warm, 3 reps median ----------
    one = tuple(int(c) for c in probe_rows[0]["cells"])

    def _drop_caches() -> bool:
        # force real disk reads (the artifact sits on ext4): without
        # this, warm timing measures task parallelism, not IO — and the
        # full path's 16 tasks beat the pruned path's 4 on a 32-core
        # box even though it touches 4x the bytes
        try:
            os.system("sync")
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
            return True
        except OSError:
            return False

    def t_gather(pruned: bool, cold: bool) -> float:
        # materialize the embedding PAYLOAD (sum of first coords), not a
        # count — a count column-prunes to the 4-byte cluster column and
        # hides exactly the IO the file pruning saves
        out = []
        for _ in range(3):
            if cold and not _drop_caches():
                return float("nan")
            t = time.time()
            if pruned:
                df = versioned.read_version(
                    spark, root, version=man["version"],
                    predicate=[("cluster", "in", one)])
            else:
                df = versioned.read_version(
                    spark, root,
                    version=man["version"]).where(
                    F.col("cluster").isin(*one))
            df.agg(F.sum(F.element_at("embedding", 1))).collect()
            out.append(time.time() - t)
        return statistics.median(out)

    res = {
        "mult": args.mult,
        "n_vectors": emb.count(),
        "ingest_s": round(t_ingest, 2),
        "artifact_files": len(man["files"]),
        "artifact_mb": round(total_bytes / 1e6, 1),
        "probe_files_kept": sorted(f"{k}/{t}" for k, t in fracs_files),
        "probe_bytes_frac_median": round(
            statistics.median(fracs_bytes), 3),
        "gather_pruned_warm_s": round(t_gather(True, False), 3),
        "gather_full_warm_s": round(t_gather(False, False), 3),
        "gather_pruned_cold_s": round(t_gather(True, True), 3),
        "gather_full_cold_s": round(t_gather(False, True), 3),
    }
    if args.mult == 1:
        a = [tuple(r) for r in S.nd_ann_ivf(spark, corpus).collect()]
        b = [tuple(r)
             for r in S.nd_ann_ivf_pruned(spark, corpus).collect()]
        res["pruned_equals_full_rows"] = (a == b and bool(a))
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
