"""Round-12 delta-adoption measurement: an appended corpus (crawl epoch
N+1 = epoch N's part files + new shards) updates a per-row-pure index by
hashing ONLY the new shards and hardlinking the parent's published
files, vs the full rebuild content addressing alone would force.

Fixture: the sf0.1 documents table replicated --mult x with the
scale_crossover per-replica text perturbation (each replica its own
part FILE — the multi-shard layout delta adoption recognizes); epoch 2
appends ceil(mult/10) more replicas (a 10% crawl increment).

Measured per kind (sig = minhash signatures, the heaviest per-doc
index; extract = the HTML->text front-door artifact):
  e1_full_s    cold build+publish of epoch 1 (the baseline ingest)
  e2_delta_s   epoch 2 via delta adoption (hash the 10%, link the 90%)
  e2_full_s    epoch 2 from scratch (store cleared of the parent)
Run:  python experiments/index_delta_r12.py [--mult 100]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.scale_crossover import SF_DIR


def build_epochs(scratch: str, mult: int) -> tuple[str, str, int]:
    """epoch1 = mult perturbed replicas, ONE PART FILE EACH; epoch2 =
    epoch1's files (hardlinked) + ceil(mult/10) appended replica parts.
    Returns (epoch1_dir, epoch2_dir, n_appended)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    extra = max(1, math.ceil(mult / 10))
    e1 = os.path.join(scratch, f"x{mult}_delta_epoch1")
    e2 = os.path.join(scratch, f"x{mult}_delta_epoch2")
    marker = os.path.join(e2, "_READY")
    if os.path.exists(marker):
        return e1, e2, extra
    for d in (e1, e2):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(os.path.join(d, "documents.parquet"))
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base_max = src["doc_id"].combine_chunks().to_numpy().max() + 1
    texts = src["text"].to_pylist()
    for i in range(mult + extra):
        if i == 0:
            t = src
        else:
            suffix = f"r{i}"
            perturbed = pa.array(
                [" ".join(w + suffix for w in x.split(" "))
                 for x in texts])
            t = src.set_column(src.schema.get_field_index("text"),
                               "text", perturbed)
            ids = pa.array(src["doc_id"].combine_chunks().to_numpy()
                           + i * base_max)
            t = t.set_column(t.schema.get_field_index("doc_id"),
                             "doc_id", ids)
        part = f"part-{i:05d}.parquet"
        p2 = os.path.join(e2, "documents.parquet", part)
        pq.write_table(t, p2)
        if i < mult:
            os.link(p2, os.path.join(e1, "documents.parquet", part))
    open(marker, "w").close()
    return e1, e2, extra


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    from bacalhau_spark.operators.dedup import (_index_table_root,
                                                clear_session_index,
                                                minhash_signature_index)
    from bacalhau_spark.operators.web import html_extract_index
    from bacalhau_spark.session import get_session
    from bacalhau_spark.sources.versioned import latest_manifest

    spark = get_session("index-delta-r12")
    spark.sparkContext.setLogLevel("ERROR")
    e1, e2, extra = build_epochs(args.scratch, args.mult)

    kinds = {"sig": minhash_signature_index,
             "extract": html_extract_index}
    out = {"mult": args.mult, "appended_shards": extra, "kinds": {}}
    for kind, fn in kinds.items():
        for d in (e1, e2):
            shutil.rmtree(_index_table_root(d, kind, "documents"),
                          ignore_errors=True)
        clear_session_index(spark)

        t0 = time.perf_counter()
        n1 = fn(spark, e1).count()
        e1_full = time.perf_counter() - t0

        clear_session_index(spark)
        t0 = time.perf_counter()
        n2 = fn(spark, e2).count()
        e2_delta = time.perf_counter() - t0
        man = latest_manifest(_index_table_root(e2, kind, "documents"))
        assert man["props"].get("delta_parent"), "delta path not taken"

        # full-rebuild control: no parent in the store
        for d in (e1, e2):
            shutil.rmtree(_index_table_root(d, kind, "documents"),
                          ignore_errors=True)
        clear_session_index(spark)
        t0 = time.perf_counter()
        n2_full = fn(spark, e2).count()
        e2_full = time.perf_counter() - t0
        assert n2 == n2_full, (n2, n2_full)

        out["kinds"][kind] = {
            "rows_epoch1": n1, "rows_epoch2": n2,
            "e1_full_s": round(e1_full, 3),
            "e2_delta_s": round(e2_delta, 3),
            "e2_full_s": round(e2_full, 3),
            "speedup": round(e2_full / e2_delta, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
