"""Scale-crossover experiment: Spark vs DuckDB as data grows past one
row group.

BASELINE.md documents why the sf0.1 bench ratios overstate Spark's cost:
every fixture file is a SINGLE parquet row group, so each Spark scan is one
task (parallelism starts only after the first shuffle) and the 150-250 ms
plan/codegen constant is a large fraction of sub-second queries. Both
effects are constant in data size. This experiment measures the actual
crossover: the same query shapes on N× replicas of the sf0.1 fixtures,
written with PRODUCTION row-group sizing (~64k rows per group) so Spark
gets the input splits a real 100 TB layout would give it.

Usage:
    python experiments/scale_crossover.py [--mult 10] [--scratch DIR]

Writes nothing outside --scratch (default /tmp/bacalhau_spark_scale) and
prints one JSON line per (query, engine, scale) plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
ROW_GROUP_ROWS = 64 * 1024


def build_scaled(scratch: str, mult: int) -> str:
    """Replicate lineitem/orders/documents mult× with shifted keys, written
    in ~64k-row groups (the layout a real ingest produces)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out_dir = os.path.join(scratch, f"x{mult}")
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    specs = {
        # table -> (key columns to shift so replicas don't collide)
        "lineitem": ("l_orderkey",),
        "orders": ("o_orderkey",),
        "documents": ("doc_id",),
    }
    for name, keys in specs.items():
        src = pq.read_table(f"{SF_DIR}/{name}.parquet")
        n_key = {k: pc.max(src[k]).as_py() + 1 for k in keys}
        parts = []
        for i in range(mult):
            t = src
            for k in keys:
                t = t.set_column(t.schema.get_field_index(k), k,
                                 pc.add(t[k], i * n_key[k]))
            parts.append(t)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out_dir}/{name}.parquet",
                       row_group_size=ROW_GROUP_ROWS)
    open(marker, "w").close()
    return out_dir


def build_scaled_perturbed(scratch: str, mult: int) -> str:
    """documents replicated mult× with DETERMINISTIC per-replica text
    perturbation: replica i>0 suffixes every word with 'r{i}' (a pure
    function of (text, i) — no RNG, stable across runs). Every shingle of
    a perturbed replica differs from the original's, so replicas are NOT
    near-dups of each other and LSH candidate pairs grow LINEARLY with
    the multiplier (each replica reproduces the base corpus's own
    near-dup pairs, nothing cross-replica) — the honest >10× scaling
    fixture the plain build_scaled cannot provide (identical-text
    replicas make every copy a near-dup and pair output quadratic)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(scratch, f"x{mult}_perturbed")
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SF_DIR}/documents.parquet")
    base_max = src["doc_id"].combine_chunks().to_numpy().max() + 1
    texts = src["text"].to_pylist()
    parts = [src]
    for i in range(1, mult):
        suffix = f"r{i}"
        perturbed = pa.array(
            [" ".join(w + suffix for w in t.split(" ")) for t in texts])
        t = src.set_column(src.schema.get_field_index("text"), "text",
                           perturbed)
        ids = pa.array((src["doc_id"].combine_chunks().to_numpy()
                        + i * base_max))
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/documents.parquet",
                   row_group_size=ROW_GROUP_ROWS)
    open(marker, "w").close()
    return out_dir


def build_scaled_embeddings(scratch: str, mult: int) -> str:
    """embeddings replicated mult× with shifted vec_ids AND a
    deterministic per-replica sign perturbation: replica i negates the
    bucketed dimensions j (j < SEMDEDUP_SIGN_BITS) whose bit is set in
    i — a pure function of i, no RNG — so replica i's sign bucket is
    base_bucket XOR i and, for mult < 2^SIGN_BITS, every replica of a
    vector occupies a DIFFERENT bucket: bucket sizes stay at base level
    and within-bucket pairs grow linearly. (Identical replicas — or
    flips of only non-bucketed dims — would multiply bucket occupancy by
    mult and grow pairs quadratically: the same degenerate-fixture trap
    the perturbed documents build fixes for LSH.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(scratch, f"emb_x{mult}")
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    base_max = src["vec_id"].combine_chunks().to_numpy().max() + 1
    emb = np.array(src["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    parts = []
    from bacalhau_spark.operators.similarity import SEMDEDUP_SIGN_BITS
    if mult >= (1 << SEMDEDUP_SIGN_BITS):
        raise ValueError("mult must stay below 2^SIGN_BITS for the "
                         "distinct-bucket guarantee")
    for i in range(mult):
        e = emb.copy()
        for j in range(SEMDEDUP_SIGN_BITS):
            if (i >> j) & 1:
                # robust bit flip: negating 0.0 gives -0.0, and the bucket
                # test (x >= 0) is true for BOTH zeros — an exact-zero
                # component would silently break the distinct-bucket
                # guarantee, so zeros flip to a small negative instead
                col = e[:, j]
                e[:, j] = np.where(col == 0.0, np.float32(-1e-6), -col)
        ids = pa.array(src["vec_id"].combine_chunks().to_numpy()
                       + i * base_max)
        t = pa.table({
            "vec_id": ids,
            "embedding": pa.array(list(e),
                                  type=pa.list_(pa.float32())),
            "label": src["label"].combine_chunks(),
        })
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   f"{out_dir}/embeddings.parquet",
                   row_group_size=ROW_GROUP_ROWS)
    open(marker, "w").close()
    return out_dir


# Query shapes: the same three plans the sf0.1 bench leans on, expressed
# once for each engine. (Self-contained SQL on purpose — this experiment
# measures engine execution, not the registry plumbing.)
SHAPES = {
    "scan_agg": {  # q17_hash_agg / TPC-H Q1 shape
        "sql": "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq, "
               "AVG(l_extendedprice) AS ap, COUNT(*) AS n "
               "FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "tables": ("lineitem",),
    },
    "join_agg": {  # q13_join_agg shape
        "sql": "SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS sq "
               "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
               "GROUP BY o_orderpriority",
        "tables": ("lineitem", "orders"),
    },
    "multiway_join": {  # q15/q3/q7 family: two fact shuffles + dim probe
        # customer stays UNscaled (replicas shift only o_orderkey, so
        # o_custkey still joins the original dim — exactly how a real
        # scale-up grows facts faster than dims)
        "sql": "SELECT c_mktsegment, COUNT(*) AS n, SUM(l_quantity) AS sq "
               "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
               "JOIN customer ON o_custkey = c_custkey "
               "GROUP BY c_mktsegment",
        "tables": ("lineitem", "orders", "customer"),
    },
    "text_hash": {  # minhash signature stage shape: md5 per word + fold
        "sql": None,  # engine-specific below (md5/list functions differ)
        "tables": ("documents",),
    },
    "curation_gates": {  # nd_gopher_filter shape: per-row array gates
        "sql": None,  # engine-specific below (array function names differ)
        "tables": ("documents",),
    },
}

# The Gopher-gate conjunction reduced to one number, so the full per-row
# expression tree evaluates end-to-end (the round-4 curation plane's
# dominant shape: token-array stats + integer threshold gates, no shuffle).
CURATION_GATES_DUCK = """
SELECT SUM(CAST(n_words BETWEEN 15 AND 90
  AND len_ns * 10 BETWEEN n_words * 25 AND n_words * 65
  AND n_stop >= 2 AND n_alpha * 10 >= n_words * 8 AS INTEGER)) AS kept
FROM (SELECT
  len(string_split(lower(text), ' ')) AS n_words,
  length(replace(text, ' ', '')) AS len_ns,
  len(list_filter(string_split(lower(text), ' '),
      x -> list_contains(['the','a','of','and','to','in','is'], x))) AS n_stop,
  len(list_filter(string_split(lower(text), ' '),
      x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha
FROM documents) t
"""

CURATION_GATES_SPARK = """
SELECT SUM(CAST(n_words BETWEEN 15 AND 90
  AND len_ns * 10 BETWEEN n_words * 25 AND n_words * 65
  AND n_stop >= 2 AND n_alpha * 10 >= n_words * 8 AS INT)) AS kept
FROM (SELECT
  size(split(lower(text), ' ')) AS n_words,
  length(replace(text, ' ', '')) AS len_ns,
  size(filter(split(lower(text), ' '),
      x -> array_contains(array('the','a','of','and','to','in','is'), x)))
      AS n_stop,
  size(filter(split(lower(text), ' '), x -> x rlike '^[a-z]+$')) AS n_alpha
FROM documents) t
"""

TEXT_HASH_DUCK = """
SELECT SUM(h) AS total FROM (
  SELECT doc_id,
         list_sum(list_transform(string_split(lower(text), ' '),
                  t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)
                       % 2147483647)) AS h
  FROM documents) t
"""


def spark_text_hash(spark, d):
    from pyspark.sql import functions as F
    df = spark.read.parquet(f"{d}/documents.parquet")
    h = F.aggregate(
        F.transform(F.split(F.lower("text"), " "),
                    lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                    .cast("long") % 2147483647),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.select(F.sum(h).alias("total"))


def time_runs(fn, n=3):
    fn()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp/bacalhau_spark_scale")
    args = ap.parse_args()

    import duckdb

    from bacalhau_spark.session import get_session

    spark = get_session("scale-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for label, mult in (("sf0.1", 1), (f"sf0.1x{args.mult}", args.mult)):
        d = SF_DIR if mult == 1 else build_scaled(args.scratch, args.mult)
        con = duckdb.connect()
        for t in ("lineitem", "orders", "documents"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{d}/{t}.parquet')")
        # dims are never replicated — facts grow faster than dims
        con.execute("CREATE VIEW customer AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/customer.parquet')")
        views = {t: spark.read.parquet(f"{d}/{t}.parquet")
                 for t in ("lineitem", "orders", "documents")}
        views["customer"] = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        for t, df in views.items():
            df.createOrReplaceTempView(t)
        for shape, spec in SHAPES.items():
            if shape == "text_hash":
                s_fn = (lambda d=d: spark_text_hash(spark, d)
                        .write.mode("overwrite").format("noop").save())
                d_fn = lambda con=con: con.execute(TEXT_HASH_DUCK).fetchall()
            elif shape == "curation_gates":
                s_fn = (lambda: spark.sql(CURATION_GATES_SPARK)
                        .write.mode("overwrite").format("noop").save())
                d_fn = (lambda con=con:
                        con.execute(CURATION_GATES_DUCK).fetchall())
            else:
                sql = spec["sql"]
                s_fn = (lambda sql=sql: spark.sql(sql)
                        .write.mode("overwrite").format("noop").save())
                d_fn = lambda con=con, sql=sql: con.execute(sql).fetchall()
            row = {"scale": label, "shape": shape,
                   "spark_s": time_runs(s_fn), "duckdb_s": time_runs(d_fn)}
            row["ratio"] = round(row["spark_s"] / row["duckdb_s"], 2) \
                if row["duckdb_s"] else None
            results.append(row)
            print(json.dumps(row))
        con.close()

    print("\nshape        scale        spark_s  duckdb_s  ratio")
    for r in results:
        print(f"{r['shape']:<12} {r['scale']:<12} {r['spark_s']:>7} "
              f"{r['duckdb_s']:>9} {r['ratio']:>6}")


if __name__ == "__main__":
    main()
