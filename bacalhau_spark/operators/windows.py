"""Window functions + the orchestration event-log surface.

The reference folds a job-event stream into per-(job,node) states — max-ordinal
event wins (`pkg/job/job.go:233-259`, fold table
`pkg/executor/constants.go:211-250`), accepts the first N bidders per job
(`pkg/requesternode/requesternode.go:89-121`), dedups before acting
(`pkg/computenode/computenode.go:146-166`) and packs a FIFO backlog by running
capacity (`pkg/capacitymanager/capacitymanager.go:250-264`). Each of those
control-plane folds is a window/aggregate query over an event table — declared
here over the `events` fixture (Q20–Q24) plus session-window assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def q20_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last event per entity (Q20) — the GetCurrentJobState fold
    (`pkg/job/job.go:233-259`): max-ordinal event wins. max_by is a single
    shuffle-free-combine aggregate (partial max per partition)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max_by("event_type", "event_id").alias("last_type"))
        .orderBy("user_id")
    )


def q21_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-N-per-key (Q21) — the requester's first-N-bids-accepted gate
    (`pkg/requesternode/requesternode.go:89-121`). row_number over a
    per-key window; at scale the partition-by key spreads the work."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type",
                F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 2)
        .orderBy("user_id", "rn")
    )


def q22_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (Q22) — the hasAlreadyBid dedup
    (`pkg/computenode/computenode.go:146-166`)."""
    return (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


def q23_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running sum (Q23) — the FIFO capacity-packing fold
    (`pkg/capacitymanager/capacitymanager.go:250-264`). NOTE: a total-order
    running sum is inherently sequential; at 100 TB the scale-out form is a
    two-pass prefix sum (per-partition partials + broadcast offsets). The
    declared query keeps the single-window semantics for the oracle gate."""
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow)
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "value",
                F.round(F.sum("value").over(w), 4).alias("running"))
        .orderBy("event_id")
    )


def q24_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag (Q24) — per-entity deltas."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id",
                (F.col("value") - F.lag("value", 1, 0.0).over(w)).alias("delta"))
        .orderBy("event_id")
    )


def nd_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window assignment (batch form of the streaming session window,
    streaming/events.py). Spark's session_window merges events whose
    [ts, ts+gap) intervals overlap; end = last ts + gap. The oracle states the
    same semantics as a gaps-and-islands fold."""
    sw = F.session_window("ts", "30 minutes")
    return (
        table(spark, sf_dir, "events")
        .groupBy(sw, "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n",
        )
        .orderBy("user_id", "s_start")
    )


def trailing_1h_window() -> Window:
    """Per-user trailing-1-hour RANGE frame at microsecond precision."""
    return (Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(-3600 * 1_000_000, 0))


def nd_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, each event's trailing-1-hour value
    sum — the value-range frame (vs q23's ROWS frame). Ordering on epoch
    MICROseconds (full ts precision) so frame membership matches the
    oracle's RANGE INTERVAL '1 hour' exactly: fixture timestamps carry
    sub-second micros, and ordering on whole seconds would admit pairs
    whose true gap is in (3600s, 3601s)."""
    w = trailing_1h_window()
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id",
                F.round(F.sum("value").over(w), 4).alias("trailing_1h"))
        .orderBy("event_id")
    )


def nd_analytic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-navigation window plane in one pass: lead, first_value,
    last_value and nth_value per user ordered by event_id. last/nth use the
    full-partition frame (unbounded preceding..unbounded following) — the
    default growing frame would make last_value trivially the current row.
    One sort per partition serves all four; pure value picks, no
    arithmetic, so the hash is exact."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return (
        table(spark, sf_dir, "events")
        .select(
            "event_id", "user_id",
            F.lead("value", 1).over(w).alias("next_value"),
            F.first("value").over(w).alias("first_value"),
            F.last("value").over(w_full).alias("last_value"),
            F.nth_value("value", 2).over(w_full).alias("second_value"),
        )
        .orderBy("event_id")
    )


def nd_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function plane in one window pass: rank, dense_rank,
    percent_rank, cume_dist, ntile — one sort per partition serves all five
    (Spark computes them in a single Window operator)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice",
                                                      "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey", "o_orderpriority",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


def nd_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 history build: collapse each
    user's event stream into versioned state intervals — a row per state
    CHANGE carrying [valid_from, valid_to) and an is_current flag, the
    standard warehouse shape for tracking attribute history. Two window
    passes over the same (user_id; ts, event_id) ordering: lag() marks
    run starts, then row_number/lead() on the change rows assign version
    numbers and close each interval with its successor's start.

    Scale: both windows partition on user_id — high-cardinality and
    uniform (no Zipf head), so groups distribute evenly; Spark plans the
    two same-keyed windows into ONE exchange (the sort reuses the
    partitioning), and the stream never moves again. The event_id
    tie-break makes equal-timestamp runs deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    changes = (ev.withColumn("prev", F.lag("event_type").over(w))
               .where(F.col("prev").isNull()
                      | (F.col("prev") != F.col("event_type"))))
    return (changes
            .withColumn("version", F.row_number().over(w))
            .withColumn("valid_to", F.lead("ts").over(w))
            .select("user_id", "version",
                    F.col("event_type").alias("state"),
                    F.col("ts").alias("valid_from"), "valid_to",
                    F.col("valid_to").isNull().alias("is_current"))
            .orderBy("user_id", "version"))


_SCD2_ORACLE = """
WITH m AS (SELECT user_id, ts, event_id, event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
ch AS (SELECT user_id, ts, event_id, event_type FROM m
       WHERE prev IS NULL OR prev <> event_type)
SELECT user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS version,
       event_type AS state, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS NULL AS is_current
FROM ch ORDER BY user_id, version
"""


FUNNEL_STEPS = ("view", "click", "purchase")
CONV_SCALE = 1_000_000


def nd_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: per user, the
    first 'view', the first 'click' strictly AFTER that view, the first
    'purchase' strictly after that click — the time-respecting funnel
    (a purchase before the first view does NOT count, which is what
    separates this from three independent event-type counts). Output is
    one row per step: users reaching it and conversion vs step 1 in
    integer ppm.

    Scale shape: each step is a filtered min-aggregate on user_id joined
    to the previous step's user-sized frame — all three aggregates and
    joins share the ONE user_id hash partitioning (no re-shuffles
    between steps), and the scans are column/predicate-pruned to the one
    event type each. The final counts are three 1-row aggregates off
    user-sized frames, unioned."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type",
                                               "ts")

    def first_after(etype, prev=None, prev_col=None):
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col(prev_col))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    t1 = first_after(FUNNEL_STEPS[0])
    t2 = first_after(FUNNEL_STEPS[1], t1, f"t_{FUNNEL_STEPS[0]}")
    t3 = first_after(FUNNEL_STEPS[2], t2, f"t_{FUNNEL_STEPS[1]}")
    counts = [
        frame.agg(F.count("*").cast("long").alias("n_users"))
        .select(F.lit(i + 1).alias("step"),
                F.lit(name).alias("event_type"), "n_users")
        for i, (name, frame) in enumerate(zip(FUNNEL_STEPS, (t1, t2, t3)))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    base = t1.agg(F.count("*").alias("base"))
    return (out.crossJoin(F.broadcast(base))
            .select("step", "event_type", "n_users",
                    F.expr(f"n_users * {CONV_SCALE} div base")
                    .cast("long").alias("conv_ppm"))
            .orderBy("step"))


_FUNNEL_STEPS_ORACLE = f"""
WITH t1 AS (SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(ts) AS t_click FROM events e
       JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t_view
       WHERE event_type = 'click' GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(ts) AS t_purchase FROM events e
       JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t_click
       WHERE event_type = 'purchase' GROUP BY e.user_id),
c AS (SELECT 1 AS step, 'view' AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users FROM t1
      UNION ALL SELECT 2, 'click', COUNT(*) FROM t2
      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM t3),
b AS (SELECT COUNT(*) AS base FROM t1)
SELECT step, event_type, n_users,
       CAST(n_users * {CONV_SCALE} // base AS BIGINT) AS conv_ppm
FROM c CROSS JOIN b ORDER BY step
"""


def nd_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by their
    first-activity week (the cohort), counted in every subsequent week
    they were active, with retention vs the cohort's own size in
    integer ppm — the engagement table every analytics stack renders as
    the retention triangle. Weeks are date_trunc('week') (Monday-start
    in both engines); the offset is exact integer (datediff DIV 7).

    Scale shape: the stream reduces to distinct (user, week) pairs and
    per-user first weeks in aggregates that share the user_id exchange;
    the cohort matrix is an aggregate over the user-sized joined frame;
    cohort sizes broadcast back onto the matrix (|weeks|^2 rows)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w"))
    fw = ev.groupBy("user_id").agg(F.min("w").alias("cw"))
    act = ev.distinct()
    grid = (act.join(fw, "user_id")
            .groupBy("cw", F.expr("datediff(w, cw) div 7")
                     .cast("int").alias("week_offset"))
            .agg(F.count("*").cast("long").alias("n_active")))
    size = (grid.where(F.col("week_offset") == 0)
            .select("cw", F.col("n_active").alias("cohort_n")))
    return (grid.join(F.broadcast(size), "cw")
            .select(F.col("cw").cast("date").alias("cohort_week"),
                    "week_offset", "n_active",
                    F.expr(f"n_active * {CONV_SCALE} div cohort_n")
                    .cast("long").alias("retention_ppm"))
            .orderBy("cohort_week", "week_offset"))


_RETENTION_ORACLE = f"""
WITH ev AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
fw AS (SELECT user_id, MIN(w) AS cw FROM ev GROUP BY user_id),
act AS (SELECT DISTINCT user_id, w FROM ev),
grid AS (SELECT cw, CAST(date_diff('day', cw, w) // 7 AS INTEGER)
                AS week_offset,
                CAST(COUNT(*) AS BIGINT) AS n_active
         FROM act JOIN fw USING (user_id) GROUP BY cw, week_offset),
sz AS (SELECT cw, n_active AS cohort_n FROM grid WHERE week_offset = 0)
SELECT CAST(grid.cw AS DATE) AS cohort_week, week_offset, n_active,
       CAST(n_active * {CONV_SCALE} // cohort_n AS BIGINT)
       AS retention_ppm
FROM grid JOIN sz USING (cw) ORDER BY cohort_week, week_offset
"""


QUERIES = {
    "nd_event_funnel": (nd_event_funnel, _FUNNEL_STEPS_ORACLE),
    "nd_retention_cohorts": (nd_retention_cohorts, _RETENTION_ORACLE),
    "nd_scd2_history": (nd_scd2_history, _SCD2_ORACLE),
    "q20_last_state": (
        q20_last_state,
        "SELECT user_id, max_by(event_type, event_id) AS last_type "
        "FROM events GROUP BY user_id ORDER BY user_id",
    ),
    "q21_first_n": (
        q21_first_n,
        "SELECT event_id, user_id, event_type, rn FROM ("
        "SELECT event_id, user_id, event_type, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn "
        "FROM events) t WHERE rn <= 2 ORDER BY user_id, rn",
    ),
    "q22_distinct": (
        q22_distinct,
        "SELECT DISTINCT user_id, event_type FROM events "
        "ORDER BY user_id, event_type",
    ),
    "q23_running_sum": (
        q23_running_sum,
        "SELECT event_id, value, ROUND(SUM(value) OVER ("
        "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        "), 4) AS running FROM events ORDER BY event_id",
    ),
    "q24_lag_delta": (
        q24_lag_delta,
        "SELECT event_id, user_id, value - lag(value, 1, 0.0) OVER ("
        "PARTITION BY user_id ORDER BY event_id) AS delta "
        "FROM events ORDER BY event_id",
    ),
    "nd_moving_window": (
        nd_moving_window,
        "SELECT event_id, user_id, ROUND(SUM(value) OVER ("
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW"
        "), 4) AS trailing_1h FROM events ORDER BY event_id",
    ),
    "nd_analytic_suite": (
        nd_analytic_suite,
        "SELECT event_id, user_id, "
        "LEAD(value, 1) OVER w AS next_value, "
        "FIRST_VALUE(value) OVER w AS first_value, "
        "LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS last_value, "
        "NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS second_value "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id) "
        "ORDER BY event_id",
    ),
    "nd_ranking_suite": (
        nd_ranking_suite,
        "SELECT o_orderkey, o_orderpriority, "
        "RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, "
        "ROUND(PERCENT_RANK() OVER w, 6) AS prnk, "
        "ROUND(CUME_DIST() OVER w, 6) AS cd, "
        "CAST(NTILE(4) OVER w AS INTEGER) AS quartile "
        "FROM orders WHERE o_orderkey < 2000 "
        "WINDOW w AS (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey",
    ),
    "nd_sessionize": (
        nd_sessionize,
        "WITH o AS (SELECT user_id, ts, CASE WHEN "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
        "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
        ">= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk FROM events), "
        "g AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess "
        "FROM o) "
        "SELECT user_id, MIN(ts) AS s_start, "
        "MAX(ts) + INTERVAL '30 minutes' AS s_end, COUNT(*) AS n "
        "FROM g GROUP BY user_id, sess ORDER BY user_id, s_start",
    ),
}
