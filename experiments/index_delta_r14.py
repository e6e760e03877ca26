"""Round-14: the cand-delta WIDTH GATE takes the cheaper path.

Round 13 measured the band-candidate delta as a 0.93x SLOWDOWN at x30
parent width and a 1.33-3.09x win at x100-x300
(experiments/index_delta_r13.txt), but _cand_delta always took the
delta path when a parent existed. Round 14 adds
CAND_DELTA_MIN_PARENT_SHARDS (=50, the one-box crossover): below it
_cand_delta declines and the store runs the full rebuild.

Protocol (same epoch fixture as r12/r13: sf0.1 documents replicated
--mult x, one part per replica; epoch 2 appends ceil(mult/10) parts):
at each mult, epoch-2 ingest is measured three ways in one session —
  gated      what HEAD does (the gate decides)
  forced_delta    gate lowered to 0
  forced_rebuild  gate raised above any width
and the gate's choice is checked against the calibration (decline at
x30, adopt at x300). Single-shot timings like r13 — margins at x30 are
sub-second, so the DECISION is the asserted quantity; the timings are
the recorded evidence.

Run:  python experiments/index_delta_r14.py --mult 30
      python experiments/index_delta_r14.py --mult 300   (16g heap)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.index_delta_r12 import build_epochs  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    from bacalhau_spark.operators import dedup
    from bacalhau_spark.operators.dedup import (_index_table_root,
                                                band_candidate_index,
                                                clear_session_index)
    from bacalhau_spark.session import get_session
    from bacalhau_spark.sources.versioned import latest_manifest

    heap = "16g" if args.mult >= 300 else "8g"
    spark = get_session("index-delta-r14",
                        extra_conf={"spark.driver.memory": heap})
    spark.sparkContext.setLogLevel("ERROR")
    e1, e2, extra = build_epochs(args.scratch, args.mult)

    def clear_e2():
        for kind in ("sig", "cand"):
            shutil.rmtree(_index_table_root(e2, kind, "documents"),
                          ignore_errors=True)

    def clear_all():
        clear_e2()
        for kind in ("sig", "cand"):
            shutil.rmtree(_index_table_root(e1, kind, "documents"),
                          ignore_errors=True)

    clear_all()
    clear_session_index(spark)
    band_candidate_index(spark, e1).count()  # publish the parent epoch

    def ingest(gate):
        old = dedup.CAND_DELTA_MIN_PARENT_SHARDS
        dedup.CAND_DELTA_MIN_PARENT_SHARDS = gate
        try:
            clear_e2()
            clear_session_index(spark)
            t0 = time.perf_counter()
            n = band_candidate_index(spark, e2).count()
            dt = time.perf_counter() - t0
        finally:
            dedup.CAND_DELTA_MIN_PARENT_SHARDS = old
        man = latest_manifest(_index_table_root(e2, "cand", "documents"))
        path = ("delta" if man["props"].get("delta_parent")
                else "rebuild")
        return n, round(dt, 3), path

    n_g, t_g, path_g = ingest(dedup.CAND_DELTA_MIN_PARENT_SHARDS)
    n_d, t_d, path_d = ingest(0)
    n_r, t_r, path_r = ingest(10**9)
    assert n_g == n_d == n_r, (n_g, n_d, n_r)
    assert path_d == "delta" and path_r == "rebuild"
    want = "rebuild" if args.mult < dedup.CAND_DELTA_MIN_PARENT_SHARDS \
        else "delta"
    assert path_g == want, (path_g, want)

    print(json.dumps({
        "mult": args.mult, "appended_shards": extra, "pairs": n_g,
        "gate": dedup.CAND_DELTA_MIN_PARENT_SHARDS,
        "gated": {"path": path_g, "s": t_g},
        "forced_delta_s": t_d, "forced_rebuild_s": t_r,
        "gate_choice_cheaper": (t_d >= t_r) == (path_g == "rebuild"),
    }))
    clear_all()
    spark.stop()


if __name__ == "__main__":
    main()
