"""Round-11 clustered-write A/B: write_version(cluster_by=[col]) range-
sorts each write so its files hold disjoint key ranges — the missing
half of footer-stats file skipping (round-10 verdict #4: on unsorted
ingest the per-file ranges all overlap and pruning degrades to
scan-everything).

Ingest model: a 4-epoch append chain over the sf0.1 documents table
where epoch e holds doc_id % 4 == e — every epoch's doc_id range spans
the whole table, the worst case for range stats. Reads: a narrow range
predicate and a point predicate; reported per table (plain vs
clustered): files opened / files total, plus the wall time of the
selective read. Run:
    python experiments/clustered_skipping_r11.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from bacalhau_spark.catalog import table
    from bacalhau_spark.scratch import scratch_dir
    from bacalhau_spark.session import get_session
    from bacalhau_spark.sources.versioned import (pruned_file_count,
                                                  read_version,
                                                  write_version)

    spark = get_session("clustered-skipping-r11")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    n = docs.count()

    base = scratch_dir("clustered_ab")
    plain, clustered = f"{base}/plain", f"{base}/clustered"
    for root in (plain, clustered):
        shutil.rmtree(root, ignore_errors=True)
    for e in range(4):
        epoch = docs.where(F.col("doc_id") % 4 == e)
        mode = "append" if e else "overwrite"
        write_version(epoch.coalesce(4), plain, mode=mode)
        write_version(epoch, clustered, mode=mode,
                      cluster_by=["doc_id"], cluster_files=4)

    preds = {
        "range_5pct": [("doc_id", ">=", 0), ("doc_id", "<", n // 20)],
        "point": [("doc_id", "==", n // 2)],
    }
    out: dict = {"sf_dir": SF_DIR, "n_docs": n}
    for name, pred in preds.items():
        row: dict = {}
        for tag, root in (("plain", plain), ("clustered", clustered)):
            kept, total = pruned_file_count(root, pred)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                read_version(spark, root, predicate=pred).write.mode(
                    "overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            row[tag] = {"files_opened": kept, "files_total": total,
                        "read_s": round(statistics.median(runs), 3)}
        out[name] = row
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
