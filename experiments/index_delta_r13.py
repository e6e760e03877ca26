"""Round-13 delta-adoption measurement for the GLOBAL-function kind:
the band-candidate index (the round-12 verdict's frontier — "every
crawl epoch re-pays the FULL candidate-generation cost even though the
signatures delta-adopt").

Epoch fixture shared with experiments/index_delta_r12.py (sf0.1
documents replicated --mult x, one part file per perturbed replica;
epoch 2 appends ceil(mult/10) more replica parts — a 10% crawl
increment).

Measured for kind cand (band candidates THROUGH the sig index — the
real epoch-ingest pipeline: the sig index delta-adopts underneath, then
_cand_delta probes only the new shards' signatures against the full
band-key space and hardlinks the parent's pair files):
  e1_full_s    cold build+publish of epoch 1 (sig + cand, the baseline)
  e2_delta_s   epoch 2 ingest via delta adoption of BOTH kinds
  e2_full_s    epoch 2 from scratch (store cleared of both parents)

Honest scaling note: unlike the per-row kinds (cost ~ delta size), the
cand delta is linear in the INDEX size — the exactness guards
(crossed-cap detection) and the probe's hot-bucket gate need per-bucket
counts over the full 8-byte band-key space. What the delta path removes
is everything text-sized: the shingle explosion, the md5 stream, the
minhash fold and the full pair expansion. At 100 TB that is the
difference between re-hashing the corpus text per epoch and scanning a
16-longs-per-doc persisted artifact.

Run:  python experiments/index_delta_r13.py [--mult 100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.index_delta_r12 import build_epochs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    from bacalhau_spark.operators.dedup import (_index_table_root,
                                                band_candidate_index,
                                                clear_session_index,
                                                winnow_posting_index)
    from bacalhau_spark.session import get_session
    from bacalhau_spark.sources.versioned import latest_manifest

    spark = get_session("index-delta-r13")
    spark.sparkContext.setLogLevel("ERROR")
    e1, e2, extra = build_epochs(args.scratch, args.mult)

    def clear_tables():
        for d in (e1, e2):
            for kind, rev in (("sig", 1), ("cand", 1), ("winnow", 2)):
                shutil.rmtree(
                    _index_table_root(d, kind, "documents", rev=rev),
                    ignore_errors=True)

    out = {"mult": args.mult, "appended_shards": extra}

    clear_tables()
    clear_session_index(spark)
    t0 = time.perf_counter()
    n1 = band_candidate_index(spark, e1).count()
    e1_full = time.perf_counter() - t0

    clear_session_index(spark)
    t0 = time.perf_counter()
    n2 = band_candidate_index(spark, e2).count()
    e2_delta = time.perf_counter() - t0
    for kind in ("sig", "cand"):
        man = latest_manifest(_index_table_root(e2, kind, "documents"))
        assert man["props"].get("delta_parent"), f"{kind}: delta not taken"

    clear_tables()
    clear_session_index(spark)
    t0 = time.perf_counter()
    n2_full = band_candidate_index(spark, e2).count()
    e2_full = time.perf_counter() - t0
    assert n2 == n2_full, (n2, n2_full)

    out["cand"] = {
        "pairs_epoch1": n1, "pairs_epoch2": n2,
        "e1_full_s": round(e1_full, 3),
        "e2_delta_s": round(e2_delta, 3),
        "e2_full_s": round(e2_full, 3),
        "speedup": round(e2_full / e2_delta, 2),
    }

    # winnow (r13: per-doc postings, df cap at read — exact delta)
    clear_session_index(spark)
    t0 = time.perf_counter()
    w1 = winnow_posting_index(spark, e1).count()
    w_e1_full = time.perf_counter() - t0
    clear_session_index(spark)
    t0 = time.perf_counter()
    w2 = winnow_posting_index(spark, e2).count()
    w_e2_delta = time.perf_counter() - t0
    man = latest_manifest(_index_table_root(e2, "winnow", "documents",
                                            rev=2))
    assert man["props"].get("delta_parent"), "winnow delta not taken"
    for d in (e1, e2):
        shutil.rmtree(_index_table_root(d, "winnow", "documents", rev=2),
                      ignore_errors=True)
    clear_session_index(spark)
    t0 = time.perf_counter()
    w2_full = winnow_posting_index(spark, e2).count()
    w_e2_full = time.perf_counter() - t0
    assert w2 == w2_full, (w2, w2_full)
    out["winnow"] = {
        "postings_epoch1": w1, "postings_epoch2": w2,
        "e1_full_s": round(w_e1_full, 3),
        "e2_delta_s": round(w_e2_delta, 3),
        "e2_full_s": round(w_e2_full, 3),
        "speedup": round(w_e2_full / w_e2_delta, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
