"""Property-based tests (hypothesis) — an upgrade over the reference's
inline-assertion-only strategy (SURVEY.md §5): randomized inputs against
pure-Python reference implementations for the operators whose semantics are
easiest to get subtly wrong (as-of tie-breaks, manifest stability).

Spark round-trips are slow, so examples are few but adversarial: tiny key
spaces and tiny timestamp ranges force key collisions and ts ties.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from bacalhau_spark.operators.asof import asof_join
from bacalhau_spark.sources.sinks import result_manifest

# (key, ts, id) with deliberately tiny domains to force ties.
_EVENT = st.tuples(st.integers(0, 2), st.integers(0, 5),
                   st.integers(0, 999))


def _ref_asof(left_rows, right_rows):
    """Reference semantics: per left row, the right row with greatest
    (ts, id) where right.ts <= left.ts and same key."""
    out = {}
    for k, ts, i in left_rows:
        best = None
        for rk, rts, ri in right_rows:
            if rk == k and rts <= ts and (best is None or (rts, ri) > best):
                best = (rts, ri)
        out[(k, ts, i)] = None if best is None else best[1]
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(left=st.lists(_EVENT, min_size=1, max_size=8, unique_by=lambda r: r[2]),
       right=st.lists(_EVENT, min_size=0, max_size=8,
                      unique_by=lambda r: r[2]))
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(left, "k bigint, ts bigint, id bigint")
    rdf = spark.createDataFrame(right, "k bigint, ts bigint, rid bigint")
    got = asof_join(ldf, rdf, on="k", ts="ts", value_cols=["rid"],
                    tiebreak="rid")
    got_map = {(r["k"], r["ts"], r["id"]): r["asof_rid"]
               for r in got.collect()}
    want = _ref_asof(left, [(k, ts, i) for k, ts, i in right])
    assert got_map == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 3), st.text("ab", max_size=3)),
                     min_size=0, max_size=10))
def test_manifest_is_layout_invariant(spark, rows):
    """result_manifest must depend only on row content — any repartitioning
    of the same rows hashes identically (replicated-verify foundation)."""
    df = spark.createDataFrame(rows, "k bigint, s string") if rows else \
        spark.range(0).select(F.col("id").alias("k"),
                              F.lit("").alias("s")).limit(0)
    m1 = result_manifest(df)
    m2 = result_manifest(df.repartition(5))
    m3 = result_manifest(df.coalesce(1))
    assert m1 == m2 == m3
