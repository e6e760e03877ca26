"""The Python-UDF plane: vectorized pandas_udf + applyInPandas group maps.

Mapping (SURVEY.md §2.2): the reference executes arbitrary user code next to
the data — docker containers and deterministic Python-in-WASM
(`pkg/executor/docker/executor.go:104-341`,
`pkg/executor/python_wasm/executor.go:48-73`, dispatch
`pkg/executor/language/executor.go:47-62`). In a Spark engine that plane is
the UDF surface, with the same two-tier dispatch:

- deterministic, vectorized work → Arrow-batched ``pandas_udf`` (the
  python_wasm analog: sandboxed, batch-at-a-time, no entropy);
- arbitrary per-group programs → ``applyInPandas`` (the docker analog: the
  black-box map over a whole partition of one key's rows).

The reference's `deterministic` flag (`pkg/executor/types.go:102-115`)
inverts onto Spark: UDFs are assumed deterministic unless marked with
``asNondeterministic()`` — ``register_udfs`` exposes both so the validation
gate (plans/validation.py) can see the difference.

All closures are self-contained (imports inside) so cloudpickle ships them
by value — workers never import this package.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bacalhau_spark.catalog import table


def make_charge_udf():
    """Vectorized per-row charge — the deterministic python job analog.
    Built as a local closure (pickled by value) so executors never need this
    module importable; Arrow moves whole columns, pandas does one vectorized
    expression per batch (no per-row Python)."""

    def _charge(extendedprice: pd.Series, discount: pd.Series,
                tax: pd.Series) -> pd.Series:
        return extendedprice * (1 - discount) * (1 + tax)

    return pandas_udf(_charge, "double")


def register_udfs(spark: SparkSession) -> None:
    """Register the UDF surface for spark.sql users. `entropy()` is the
    deliberately-nondeterministic example (asNondeterministic), which the
    verified-mode plan gate must reject."""
    spark.udf.register("charge_py", make_charge_udf())

    def _entropy() -> float:
        import random
        return random.random()

    entropy = F.udf(_entropy, "double").asNondeterministic()
    spark.udf.register("entropy", entropy)


def nd_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's charge computed through the Arrow-batched pandas_udf instead of
    built-ins — the dispatch target for 'deterministic python' jobs. The
    pandas expression is IEEE-identical to the built-in column expression
    (same multiply order), so the oracle hash-matches on raw doubles."""
    charge_udf = make_charge_udf()
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber",
                  charge_udf("l_extendedprice", "l_discount", "l_tax")
                  .alias("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    )


GROUP_OLS_SCHEMA = "user_id bigint, n bigint, slope double"


def nd_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fit via applyInPandas — the 'arbitrary program over
    one key's data' analog of the reference's docker executor. Fits an OLS
    slope of value over event_id per user. The closed-form moment formula
    matches the oracle's regr_slope; output rounded (summation order within
    a group is pandas', not the oracle's)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        x = pdf["event_id"].astype("float64")
        y = pdf["value"].astype("float64")
        n = len(pdf)
        vx = ((x - x.mean()) ** 2).sum()
        slope = (((x - x.mean()) * (y - y.mean())).sum() / vx
                 if vx > 0 else None)
        return _pd.DataFrame({
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n": [n],
            "slope": [None if slope is None else round(slope, 6)],
        })

    # Bounded to the low-key user slice: applyInPandas pays ~4-5 ms of
    # Arrow-slice + frame-build overhead PER GROUP, which is the right
    # trade for few/large groups and an anti-pattern for many small ones
    # (this module's own A/B: 1500 tiny groups ran 8x slower here than
    # nd_grouped_python's repartition+mapInPandas form, which remains the
    # full-corpus path below). The demo now matches its documented use.
    events = (table(spark, sf_dir, "events")
              .where(F.col("user_id") < 300)
              .select("user_id", "event_id", "value"))
    return (events.groupBy("user_id").applyInPandas(fit, GROUP_OLS_SCHEMA)
            .orderBy("user_id"))


def nd_grouped_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The many-small-groups scale pattern: same per-user OLS fit as
    nd_applyinpandas, but via repartition(key) + mapInPandas with a
    *vectorized* pandas groupby inside each batch — ONE Python invocation
    per partition instead of one Arrow slice per group. At sf0.1 this is
    ~8x faster than the group-map path (0.8 s vs 6.5 s for 1500 groups);
    at 100 TB with millions of keys it is the only viable shape, while
    applyInPandas remains right for few/large groups. Two-pass centered
    moments (means first, then centered products) so the slope matches
    regr_slope to 6 decimals without catastrophic cancellation."""

    def fit_batches(batches):
        import pandas as _pd

        dfs = list(batches)
        if not dfs:
            return
        pdf = _pd.concat(dfs, ignore_index=True)
        x = pdf["event_id"].astype("float64")
        y = pdf["value"].astype("float64")
        u = pdf["user_id"]
        g = _pd.DataFrame({"u": u, "x": x, "y": y})
        means = g.groupby("u").transform("mean")
        dx = x - means["x"]
        dy = y - means["y"]
        agg = (_pd.DataFrame({"u": u, "sxy": dx * dy, "sxx": dx * dx})
               .groupby("u").agg(n=("sxy", "size"), sxy=("sxy", "sum"),
                                 sxx=("sxx", "sum")))
        slope = (agg["sxy"] / agg["sxx"]).where(agg["sxx"] > 0).round(6)
        yield _pd.DataFrame({
            "user_id": agg.index.astype("int64"),
            "n": agg["n"].astype("int64"),
            "slope": slope,
        })

    events = table(spark, sf_dir, "events").select("user_id", "event_id",
                                                   "value")
    return (
        events.repartition("user_id")
        .mapInPandas(fit_batches, GROUP_OLS_SCHEMA)
        .orderBy("user_id")
    )


COGROUP_SCHEMA = ("user_id bigint, n_events bigint, n_orders bigint, "
                  "sum_value double, sum_orders double")


def nd_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided grouped Python merge via cogroup().applyInPandas — the
    'arbitrary program over BOTH sides of one key' surface (custom join
    logic Spark's join operators can't express). Each key's events and
    orders partitions arrive as two pandas frames; keys present on either
    side appear (full-outer semantics). Bounded to 300 keys — the group-map
    per-key overhead story of nd_applyinpandas applies unchanged."""

    def merge(key, ev, od):
        import pandas as _pd

        (k,) = key
        ne, no = len(ev), len(od)
        sv = float(ev["value"].sum()) if ne else 0.0
        so = float(od["o_totalprice"].sum()) if no else 0.0
        return _pd.DataFrame({
            "user_id": [int(k)], "n_events": [ne], "n_orders": [no],
            "sum_value": [round(sv, 3)], "sum_orders": [round(so, 2)],
        })

    ev = (table(spark, sf_dir, "events")
          .where(F.col("user_id") < 300).select("user_id", "value"))
    od = (table(spark, sf_dir, "orders")
          .where(F.col("o_custkey") < 300)
          .select(F.col("o_custkey").alias("user_id"), "o_totalprice"))
    return (
        ev.groupBy("user_id").cogroup(od.groupBy("user_id"))
        .applyInPandas(merge, COGROUP_SCHEMA)
        .orderBy("user_id")
    )


QUERIES = {
    "nd_pandas_udf": (
        nd_pandas_udf,
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber",
    ),
    "nd_applyinpandas": (
        nd_applyinpandas,
        "SELECT user_id, COUNT(*) AS n, "
        "ROUND(regr_slope(value, event_id), 6) AS slope "
        "FROM events WHERE user_id < 300 GROUP BY user_id ORDER BY user_id",
    ),
    "nd_grouped_python": (
        nd_grouped_python,
        "SELECT user_id, COUNT(*) AS n, "
        "ROUND(regr_slope(value, event_id), 6) AS slope "
        "FROM events GROUP BY user_id ORDER BY user_id",
    ),
    "nd_cogroup": (
        nd_cogroup,
        "WITH e AS (SELECT user_id, COUNT(*) AS n_events, "
        "ROUND(SUM(value), 3) AS sum_value FROM events "
        "WHERE user_id < 300 GROUP BY user_id), "
        "o AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS sum_orders FROM orders "
        "WHERE o_custkey < 300 GROUP BY o_custkey) "
        "SELECT COALESCE(e.user_id, o.user_id) AS user_id, "
        "COALESCE(n_events, 0) AS n_events, "
        "COALESCE(n_orders, 0) AS n_orders, "
        "COALESCE(sum_value, 0.0) AS sum_value, "
        "COALESCE(sum_orders, 0.0) AS sum_orders "
        "FROM e FULL OUTER JOIN o ON e.user_id = o.user_id "
        "ORDER BY user_id",
    ),
}
