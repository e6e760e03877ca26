"""Differential correctness: every registered query vs its DuckDB oracle.

This is the local rehearsal of the driver's correctness gate
(CORRECTNESS_r{N}.json): same parquet fixtures, Spark result compared to
DuckDB running the declared oracle SQL — row count, schema shape, and values.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from bacalhau_spark.catalog import TABLES
from bacalhau_spark.registry import ALL_QUERIES

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            sample = s.dropna()
            if len(sample) and hasattr(sample.iloc[0], "isoformat"):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: None if v is None else str(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first")
    return df.reset_index(drop=True)


def _cell(v) -> str:
    if v is None or v is pd.NaT:
        return "\\N"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "\\N" if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _value_hash(df: pd.DataFrame) -> str:
    """Exact, representation-sensitive hash of a *normalized* frame.

    This is the driver-gate rehearsal the tolerance compare cannot be:
    `check_dtype=False, rtol=1e-9` hides an int-vs-float drift (DuckDB
    HUGEINT -> float64: 7973.0 vs 7973) and a ROUND at a .005 boundary
    (….79 vs …*.80) — both of which the round-2 driver flagged as hash
    FAILs while this suite stayed green. Cells are stringified with no
    tolerance, so any representation difference fails locally first.
    """
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(_cell(v) for v in row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


ORACLE_CASES = sorted(n for n, (_, sql) in ALL_QUERIES.items() if sql)
NO_ORACLE_CASES = sorted(n for n, (_, sql) in ALL_QUERIES.items() if not sql)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    fn, sql = ALL_QUERIES[name]
    if callable(sql):  # per-fixture oracle provider (nd_pca_project)
        sql = sql(sf_dir)
    got = _normalize(fn(spark, sf_dir).toPandas())
    want = _normalize(oracle_con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), \
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), \
        f"{name}: row count {len(got)} vs oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-12,
                                  obj=name)
    gh, wh = _value_hash(got), _value_hash(want)
    assert gh == wh, (
        f"{name}: exact value-hash mismatch ({gh[:12]} vs {wh[:12]}) — "
        "values agree within tolerance but their representations differ "
        "(int-vs-float dtype drift, or a ROUND on an order-dependent "
        "double sum); the driver's hash gate WILL flag this. Make the "
        "checked columns representation-stable (CAST oracle sums to "
        "BIGINT, audit in integer cents / DECIMAL, never "
        "ROUND(SUM(double)) at a data-engineered boundary).")


@pytest.mark.parametrize("name", NO_ORACLE_CASES)
def test_no_oracle_query_runs(name, spark, sf_dir):
    fn, _ = ALL_QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
