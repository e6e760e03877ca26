"""Streaming tests: batch ≡ stream equivalence (SURVEY.md §5 item 6).

The Q28 contract: the same tumbling-window aggregate through readStream
(file source, availableNow trigger, complete mode) must equal the batch
result over the finite fixture directory.
"""

from __future__ import annotations

from bacalhau_spark.streaming.events import (q28_tumbling_window,
                                             run_stream_to_memory)


def test_stream_equals_batch(spark, sf_dir):
    batch = q28_tumbling_window(spark, sf_dir).collect()
    stream = run_stream_to_memory(spark, sf_dir,
                                  table_name="t_stream_q28").collect()
    assert len(batch) == len(stream)
    b = {(r["ws"], r["event_type"]): (r["c"], r["s"]) for r in batch}
    s = {(r["ws"], r["event_type"]): (r["c"], r["s"]) for r in stream}
    assert b == s
