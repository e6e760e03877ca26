"""Plan validation + canonical manifest tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.plans.validation import (NondeterministicPlanError,
                                             assert_deterministic,
                                             validate_sql)
from bacalhau_spark.sources.sinks import result_manifest, write_deterministic

from tests.conftest import SF_DIR


def test_deterministic_plan_passes(spark):
    assert_deterministic(table(spark, SF_DIR, "nation").select("n_name"))


@pytest.mark.parametrize("expr", ["rand()", "uuid()",
                                  "monotonically_increasing_id()",
                                  "current_timestamp()"])
def test_nondeterministic_plans_rejected(spark, expr):
    df = table(spark, SF_DIR, "nation").withColumn("x", F.expr(expr))
    with pytest.raises(NondeterministicPlanError):
        assert_deterministic(df)


def test_nondeterministic_udf_rejected(spark):
    """A Python UDF marked asNondeterministic must fail the verified-mode
    gate via the Catalyst deterministic-flag walk (the name-pattern list
    can't know user function names)."""
    from bacalhau_spark.functions.udfs import register_udfs
    register_udfs(spark)
    df = table(spark, SF_DIR, "nation").selectExpr("n_name", "entropy() AS e")
    with pytest.raises(NondeterministicPlanError):
        assert_deterministic(df)


def test_deterministic_pandas_udf_passes(spark):
    """The deterministic pandas_udf plane must NOT trip the gate — this is
    the reference's python_wasm contract (deterministic python allowed in
    verified jobs)."""
    from bacalhau_spark.functions.udfs import make_charge_udf
    charge = make_charge_udf()
    df = table(spark, SF_DIR, "lineitem").select(
        charge("l_extendedprice", "l_discount", "l_tax").alias("c"))
    assert_deterministic(df)


def test_validate_sql_parses_without_running(spark):
    table(spark, SF_DIR, "nation").createOrReplaceTempView("v_nation")
    validate_sql(spark, "SELECT n_name FROM v_nation")
    with pytest.raises(Exception):
        validate_sql(spark, "SELECT no_such_col FROM v_nation")


def test_manifest_partitioning_independent(spark):
    """The content manifest must not depend on physical layout — the property
    replicated verification relies on (engine.py)."""
    df = table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    m1 = result_manifest(df)
    m2 = result_manifest(df.repartition(7, "c_custkey"))
    m3 = result_manifest(df.coalesce(1))
    assert m1 == m2 == m3
    changed = result_manifest(df.limit(10))
    assert changed != m1


def test_write_deterministic_roundtrip(spark, tmp_path):
    df = table(spark, SF_DIR, "nation")
    out = str(tmp_path / "nation_out")
    manifest = write_deterministic(df, out, sort_cols=["n_nationkey"])
    back = spark.read.parquet(out)
    assert result_manifest(back) == manifest
