"""Streaming tests: batch ≡ stream equivalence (SURVEY.md §5 item 6).

The Q28 contract: the same tumbling-window aggregate through readStream
(file source, availableNow trigger, complete mode) must equal the batch
result over the finite fixture directory.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.operators.windows import nd_sessionize
from bacalhau_spark.streaming.events import (batch_purchase_click_join,
                                             q28_tumbling_window,
                                             run_stateful_fold,
                                             run_stream_foreach_batch,
                                             run_stream_session_to_memory,
                                             run_stream_stream_join,
                                             run_stream_to_memory)


def test_stream_equals_batch(spark, sf_dir):
    batch = q28_tumbling_window(spark, sf_dir).collect()
    stream = run_stream_to_memory(spark, sf_dir,
                                  table_name="t_stream_q28").collect()
    assert len(batch) == len(stream)
    b = {(r["ws"], r["event_type"]): (r["c"], r["s"]) for r in batch}
    s = {(r["ws"], r["event_type"]): (r["c"], r["s"]) for r in stream}
    assert b == s


def test_stream_session_equals_batch(spark, sf_dir):
    batch = nd_sessionize(spark, sf_dir).collect()
    stream = run_stream_session_to_memory(
        spark, sf_dir, table_name="t_stream_sessions").collect()
    b = {(r["user_id"], r["s_start"], r["s_end"]): r["n"] for r in batch}
    s = {(r["user_id"], r["s_start"], r["s_end"]): r["n"] for r in stream}
    assert b == s


def test_stateful_fold_equals_batch(spark, sf_dir):
    got = run_stateful_fold(spark, sf_dir,
                            table_name="t_stream_state").collect()
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"),
             F.max_by("event_type", "event_id").alias("last_type"))
        .collect()
    )
    g = {r["user_id"]: (r["n"], round(r["total"], 6), r["last_type"])
         for r in got}
    w = {r["user_id"]: (r["n"], round(r["total"], 6), r["last_type"])
         for r in want}
    assert g == w


def test_stream_stream_join_equals_batch(spark, sf_dir):
    got = {(r["user_id"], r["p_id"], r["c_id"])
           for r in run_stream_stream_join(
               spark, sf_dir, table_name="t_ssj").collect()}
    want = {(r["user_id"], r["p_id"], r["c_id"])
            for r in batch_purchase_click_join(spark, sf_dir).collect()}
    assert want, "batch join produced no pairs (fixture regression)"
    assert got == want


def test_stream_static_join_equals_batch(spark, sf_dir):
    from bacalhau_spark.streaming.events import run_stream_static_join
    got = {(r["c_mktsegment"], r["n"]) for r in
           run_stream_static_join(spark, sf_dir,
                                  table_name="t_ss_static").collect()}
    want = {(r["c_mktsegment"], r["n"]) for r in
            table(spark, sf_dir, "events")
            .join(table(spark, sf_dir, "customer"),
                  F.col("user_id") == F.col("c_custkey"))
            .groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()}
    assert got == want and got


def test_stream_dedup_one_row_per_key(spark, sf_dir):
    """Streaming dropDuplicates must emit exactly one row per
    (user_id, event_type) — same key set as batch distinct."""
    from bacalhau_spark.streaming.events import run_stream_dedup
    got = run_stream_dedup(spark, sf_dir, table_name="t_sdedup").collect()
    keys = [(r["user_id"], r["event_type"]) for r in got]
    assert len(keys) == len(set(keys)), "duplicate keys survived"
    want = {(r["user_id"], r["event_type"])
            for r in table(spark, sf_dir, "events")
            .select("user_id", "event_type").distinct().collect()}
    assert set(keys) == want


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    out = str(tmp_path / "fb_out")
    batch_ids = run_stream_foreach_batch(spark, sf_dir, out)
    assert batch_ids, "no micro-batches executed"
    files = glob.glob(f"{out}/batch=*/*.parquet")
    assert files, "foreachBatch wrote no parquet"
    written = spark.read.parquet(f"{out}/batch={max(batch_ids)}")
    batch = q28_tumbling_window(spark, sf_dir)
    assert written.count() == batch.count()
