"""Training-data pipeline operators: deterministic sampling, dataset
splits, reshaping, and incremental upsert.

These are the dataset-maintenance verbs a 100 TB corpus pipeline needs
around the core dedup/similarity/text ops. The common design rule: any
row-selection decision is a pure function of row *content* (md5 of a stable
key), never of partitioning, row order, or RNG state — so a resampled 100 TB
corpus produces the identical split on any cluster layout, and incremental
reruns are reproducible. The reference's closest analog is its deterministic
python_wasm execution contract (`pkg/executor/python_wasm/executor.go:48-73`:
same input CID → same output), restated here at row granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table


def nd_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 content-hash sample of the corpus: keep documents
    whose md5(text) starts with '0'. Unlike TABLESAMPLE/rand(), the sample
    is stable across engines, partitionings, and reruns — the only sampling
    admissible under the verified-output contract. Scales embarrassingly:
    the predicate evaluates per-row inside codegen, no shuffle."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.where(F.substring(F.md5(F.col("text")), 1, 1) == "0")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


STRATUM_FRAC = 0.2


def nd_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with EXACT per-stratum quotas: within each
    language keep the ceil(n_lang * 0.2) documents that rank first by
    md5(doc_id) — a deterministic uniform draw (hash order is independent
    of any document property), reproducible on any cluster layout. Unlike
    nd_hash_sample's fixed-probability filter, every stratum lands exactly
    its quota — the guarantee dataset-balance specs need.

    Plan: one shuffle on the stratum key, then rank-within-stratum. For a
    100 TB corpus with FEW strata this window would serialize each stratum
    through one task; the scale variant samples a per-stratum hash
    THRESHOLD from an approx quantile of the 60-bit hash space instead
    (constant memory, same determinism, quota exact to ±approx-error).
    Strata here are languages (many, small) so the exact form is right."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.md5(F.col("doc_id").cast("string"))
    rank_w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    cnt_w = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id", "lang",
            F.row_number().over(rank_w).alias("rn"),
            F.count("*").over(cnt_w).alias("n_lang"))
        .where(F.col("rn") <= F.ceil(F.col("n_lang") * F.lit(STRATUM_FRAC)))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


def nd_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~75/12.5/12.5) by the first hex
    digit of md5(doc_id): 0-b -> train, c-d -> val, e-f -> test. Keying on
    the id (not text) keeps exact-duplicate texts in the same relation to
    their ids; keying on text instead would co-locate dups in one split —
    both are one-line policies. Returns the lang x split histogram (the
    split-audit report)."""
    docs = table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (F.when(h < "c", "train")
             .when(h < "e", "val")
             .otherwise("test"))
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


def nd_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (UNPIVOT / melt): per-returnflag metric columns
    become (metric, value) rows — the inverse of nd_pivot. Spark's
    DataFrame.unpivot is a zero-shuffle Expand over the aggregated rows."""
    wide = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )
    return (
        wide.unpivot("l_returnflag", ["sum_qty", "sum_price"],
                     "metric", "value")
        .orderBy("l_returnflag", "metric")
    )


def nd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental upsert (CDC merge, latest-version-wins): an updates
    batch — every 7th order with a 10% price bump — merged over the base
    snapshot by union + row_number on (key, version desc). This is the
    MERGE INTO pattern without a table format: one shuffle on the merge
    key; at 100 TB the same plan applies per partition of a date-
    partitioned base, touching only affected partitions. Returns the
    post-merge per-status audit aggregate.

    The audit is carried in integer CENTS (bigint), never doubles: prices
    have exactly 2 decimals, so ``ROUND(price*100)`` is exact, and the 10%
    bump is integer arithmetic (``cents*11 DIV 10``). A double SUM is
    summation-order-dependent in its last bits, and ROUNDing it at a .005
    boundary made Spark and DuckDB disagree — bigint sums are associative
    and hash identically regardless of partitioning."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = (table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", cents.alias("cents"))
            .withColumn("version", F.lit(0)))
    updates = (table(spark, sf_dir, "orders")
               .where(F.col("o_orderkey") % 7 == 0)
               .select("o_orderkey", "o_orderstatus",
                       F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) "
                              "* 11 DIV 10").alias("cents"))
               .withColumn("version", F.lit(1)))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    merged = (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.sum("cents").alias("total_cents"))
        .orderBy("o_orderstatus")
    )


def nd_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (A-ES / exponential-sort-key): per
    language, keep the 3 documents with the largest ln(u)/w key, where u is
    a content-hash pseudo-uniform in (0,1] and w = n_chars — longer docs
    proportionally likelier, yet the draw is a pure function of content
    (same sample on any cluster layout / rerun). One window rank per
    stratum; no RNG state, no driver involvement."""
    docs = table(spark, sf_dir, "documents")
    u = ((F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
          .cast("double") + 1.0) / float(16 ** 15))
    key = F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(F.col("wkey").desc(), "doc_id")
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("wkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("lang", "rn", "doc_id", "n_chars")
        .orderBy("lang", "rn")
    )


def nd_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k buckets): the binning
    primitive behind distribution audits. floor-division bucketing is one
    codegen expression; the aggregate shuffles one row per bucket."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 50000).cast("int")
                 .alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.round(F.min("o_totalprice"), 2).alias("lo"),
             F.round(F.max("o_totalprice"), 2).alias("hi"))
        .orderBy("bucket")
    )


def nd_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows above their group's average (the correlated-aggregate filter):
    per-user mean via a window aggregate — no self-join, one shuffle on
    user_id shared by the window and nothing else."""
    w = Window.partitionBy("user_id")
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_avg", F.avg("value").over(w))
        .where(F.col("value") > F.col("user_avg"))
        .select("event_id", "user_id", "value",
                F.round("user_avg", 6).alias("user_avg"))
        .orderBy("event_id")
    )


def nd_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization: z-score of document length within
    its language (the normalize-before-threshold step of quality
    filtering). Group mean/stddev via window aggregates — one shuffle on
    lang, no self-join, no driver-side stats pass."""
    w = Window.partitionBy("lang")
    docs = table(spark, sf_dir, "documents")
    z = ((F.col("n_chars") - F.avg("n_chars").over(w))
         / F.stddev_samp("n_chars").over(w))
    return (
        docs.select("doc_id", "lang", "n_chars", F.round(z, 6).alias("z"))
        .orderBy("doc_id")
    )


def nd_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap fill): per user, an hourly bucket
    sequence spanning their activity window, left-joined to the actual
    hourly aggregates — missing hours materialize as zero rows (the
    hypertable-rollup / resample primitive). The bucket spine is generated
    distributively with sequence()+explode per user row (no driver loop, no
    cross join against a global calendar); bounded to 20 users here, at
    scale the spine is ~users x hours rows and partitions on user_id."""
    ev = (table(spark, sf_dir, "events")
          .where(F.col("user_id") < 20)
          .select("user_id", "ts", "value"))
    hour = F.date_trunc("hour", F.col("ts"))
    spine = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
             F.date_trunc("hour", F.max("ts")).alias("h1"))
        .select("user_id",
                F.explode(F.sequence("h0", "h1", F.expr(
                    "INTERVAL 1 HOUR"))).alias("hour"))
    )
    actual = (
        ev.groupBy("user_id", hour.alias("hour"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 3).alias("sum_value"))
    )
    return (
        spine.join(actual, ["user_id", "hour"], "left")
        .select("user_id", "hour",
                F.coalesce("n_events", F.lit(0)).alias("n_events"),
                F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"))
        .orderBy("user_id", "hour")
    )


_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax")


def nd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profiling over the numeric lineitem columns — the
    engine-side ANALYZE TABLE analog feeding Catalyst-style size/selectivity
    estimates (the reference's closest cousin is the input-size probe used
    for admission, `pkg/storage/ipfs_apicopy/storage.go:67-85`).

    One independent single-column branch per profiled column, unioned.
    With columnar storage this reads EXACTLY the same bytes as a
    one-pass 5-column scan (each branch's scan prunes to its one column)
    while avoiding the multi-distinct expand operator, which would
    duplicate the full row stream once per distinct column (~6x rows
    through the aggregate; A/B at sf0.1: 2.07s single-agg vs 1.42s
    union). Branches are independent stages, so they also pipeline in
    parallel. A 100 TB nightly profile swaps COUNT(DISTINCT) for
    approx_count_distinct (HLL sketch, no distinct expansion) at the cost
    of hash-checkability. min/max are stored values, never arithmetic, so
    doubles hash identically cross-engine."""
    li = table(spark, sf_dir, "lineitem")
    branches = []
    for c in _PROFILE_COLS:
        branches.append(
            li.select(F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_null"),
                 F.countDistinct("v").alias("n_distinct"),
                 F.min(F.col("v").cast("double")).alias("min_v"),
                 F.max(F.col("v").cast("double")).alias("max_v"))
            .select(F.lit(c).alias("col_name"), "n", "n_null",
                    "n_distinct", "min_v", "max_v"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("col_name")


_PROFILE_ORACLE = "SELECT col_name, n, n_null, n_distinct, min_v, max_v FROM (" + \
    " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, COUNT(*) AS n, "
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        f"COUNT(DISTINCT {c}) AS n_distinct, "
        f"CAST(MIN({c}) AS DOUBLE) AS min_v, CAST(MAX({c}) AS DOUBLE) AS max_v "
        f"FROM lineitem"
        for c in _PROFILE_COLS
    ) + ") t ORDER BY col_name"


EPOCH_SHARDS = 8
N_EPOCHS = 2


def _epoch_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE per-epoch permutation derivation — (epoch, doc_id, sort_key,
    shard) from md5(epoch:doc_id) — shared by nd_epoch_shuffle and
    nd_epoch_manifest so the permutation and its resumability audit
    cannot drift (a manifest validating keys the shuffle no longer
    produces is exactly the corruption the manifest exists to catch).
    The oracles share _EPOCH_CTE the same way."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("epoch")
    key = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("epoch"), F.col("doc_id"))), 1, 15), 16, 10).cast("long")
    return (docs.select(epochs, "doc_id")
            .withColumn("sort_key", key)
            .withColumn("shard",
                        (F.col("sort_key") % EPOCH_SHARDS).cast("int")))


_EPOCH_CTE = f"""e AS (SELECT epoch, doc_id,
                  CAST('0x' || substring(md5(epoch || ':' || doc_id), 1, 15)
                       AS BIGINT) AS sort_key
           FROM documents CROSS JOIN
               (SELECT unnest(range({N_EPOCHS})) AS epoch) t)"""


def nd_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: for each epoch, every
    document gets a shard assignment and a 60-bit sort key derived from
    md5(epoch:doc_id) — a reproducible global permutation per epoch with
    no RNG state, the property a resumable multi-host data loader needs
    (any worker can recompute its shard's order from the seed alone).

    Emits (epoch, doc_id, shard, sort_key). Scale shape: pure per-row
    codegen — no shuffle, no window, no global sort in the OPERATOR; the
    materializing writer partitions by (epoch, shard) and
    sortWithinPartitions(sort_key), which IS the permutation (a global
    orderBy would serialize 100 TB through one range exchange for an
    order no consumer needs across shard files). Shards are hash-uniform,
    so shard files are balanced by construction."""
    return _epoch_frame(spark, sf_dir).orderBy("epoch", "doc_id")


_EPOCH_ORACLE = f"""
WITH {_EPOCH_CTE}
SELECT CAST(epoch AS INTEGER) AS epoch, doc_id, sort_key,
       CAST(sort_key % {EPOCH_SHARDS} AS INTEGER) AS shard
FROM e ORDER BY epoch, doc_id
"""


# 31-bit Mersenne prime: per-row residues < 2^31 keep the int64 partial
# sums exact up to ~2^32 rows per shard on the Spark side (DuckDB sums in
# HUGEINT regardless); a 61-bit prime would overflow int64 within rows.
EPOCH_HASH_PRIME = (1 << 31) - 1


def nd_epoch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resumability audit for nd_epoch_shuffle: one manifest row per
    (epoch, shard) with its document count and an ORDER-INSENSITIVE
    content hash (sum of the shard's sort keys mod a Mersenne prime —
    associative and exact in int64, so any worker that recomputes its
    shard in any partition order gets the same digest). A multi-host
    data loader checks its shard's (n_docs, key_sum) against this
    manifest before resuming mid-epoch — corrupted or stale shard files
    fail the check without reading any other shard.

    Scale shape: pure map-side partial aggregation over the per-row
    epoch/shard/key codegen of the shuffle operator — EPOCH_SHARDS ×
    N_EPOCHS output rows, one tiny exchange, no joins."""
    return (_epoch_frame(spark, sf_dir)
            .groupBy("epoch", "shard")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 (F.sum(F.col("sort_key") % EPOCH_HASH_PRIME)
                  % EPOCH_HASH_PRIME).cast("long").alias("key_sum"))
            .orderBy("epoch", "shard"))


_EPOCH_MANIFEST_ORACLE = f"""
WITH {_EPOCH_CTE}
SELECT CAST(epoch AS INTEGER) AS epoch,
       CAST(sort_key % {EPOCH_SHARDS} AS INTEGER) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(sort_key % {EPOCH_HASH_PRIME})
            % {EPOCH_HASH_PRIME} AS BIGINT) AS key_sum
FROM e GROUP BY 1, 2 ORDER BY epoch, shard
"""


TE_SCALE = 100  # money in exact integer cents (the round-3 audit rule)


def nd_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical-feature
    construction ML pipelines run before training: each order's
    priority category is encoded as the mean total price of the OTHER
    orders in that category ((sum - x) DIV (n - 1)), which is the
    leakage-free form (plain per-category means leak each row's own
    target into its feature). Exact integer cents end to end: the
    per-row cents cast is the only ROUND (per-row rounds are portable;
    only order-dependent double sums are not), and the LOO division is
    truncating integer math, so every encoded value hash-gates.

    Scale shape: one map-side-combined aggregate to per-category
    (sum, n) — a handful of rows — broadcast back onto the order
    stream; the fact table never shuffles and the encode itself is
    pure codegen. Singleton categories (n=1) yield NULL by the n-1=0
    guard rather than a divide-by-zero."""
    orders = (table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_orderpriority",
                      F.round(F.col("o_totalprice") * TE_SCALE)
                      .cast("long").alias("cents")))
    cat = (orders.groupBy("o_orderpriority")
           .agg(F.sum("cents").alias("s"), F.count("*").alias("n")))
    return (orders.join(F.broadcast(cat), "o_orderpriority")
            .select("o_orderkey", "o_orderpriority",
                    F.when(F.col("n") > 1,
                           F.expr("(s - cents) div (n - 1)"))
                    .cast("long").alias("loo_cents"))
            .orderBy("o_orderkey"))


_TARGET_ENCODE_ORACLE = f"""
WITH o AS (SELECT o_orderkey, o_orderpriority,
                  CAST(ROUND(o_totalprice * {TE_SCALE}) AS BIGINT) AS cents
           FROM orders),
cat AS (SELECT o_orderpriority, SUM(cents) AS s, COUNT(*) AS n
        FROM o GROUP BY o_orderpriority)
SELECT o_orderkey, o.o_orderpriority,
       CAST(CASE WHEN n > 1 THEN (s - cents) // (n - 1) END AS BIGINT)
       AS loo_cents
FROM o JOIN cat USING (o_orderpriority) ORDER BY o_orderkey
"""

EWMA_SCALE = 1000  # event values in exact integer milli-units


def nd_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    with alpha = 1/2, computed EXACTLY: values go to integer
    milli-units (per-row round — portable), and the smoothing
    recurrence ewma_i = (ewma_{i-1} + x_i) div 2 is a truncating
    integer fold over the (ts, event_id)-ordered history, seeded with
    the first value. Integer halving makes the inherently sequential
    recurrence hash-gatable cross-engine (Spark F.aggregate == DuckDB
    list_reduce — both left folds seeded with the list head), where a
    float alpha would accumulate engine-specific rounding.

    Scale shape: the per-user history is collected and folded WITHIN
    one aggregation (sort_array over struct keys makes the order part
    of the data, not the partitioning), so this is the exact-
    percentile / stateful-fold class: one shuffle on user_id, state
    bounded by the per-user history. Unbounded per-key histories want
    the streaming form (applyInPandasWithState keeps running (ewma, n)
    instead of the list) — this batch form is the backfill pass."""
    ev = (table(spark, sf_dir, "events")
          .select("user_id",
                  F.struct(F.col("ts"), F.col("event_id"),
                           F.round(F.col("value") * EWMA_SCALE)
                           .cast("long").alias("v")).alias("e")))
    arr = F.sort_array(F.collect_list("e"))
    return (ev.groupBy("user_id").agg(arr.alias("h"))
            .select("user_id",
                    F.size("h").cast("long").alias("n_events"),
                    # bracket indexing is 0-based in Spark SQL (h[0] is
                    # the head) while slice() is 1-based (start at 2 =
                    # drop the head) — easy to cross
                    F.expr("aggregate(slice(h, 2, size(h) - 1), h[0].v, "
                           "(acc, x) -> (acc + x.v) div 2)")
                    .cast("long").alias("ewma_milli"))
            .orderBy("user_id"))


_EWMA_ORACLE = f"""
WITH e AS (SELECT user_id,
                  {{'ts': ts, 'event_id': event_id,
                    'v': CAST(ROUND(value * {EWMA_SCALE}) AS BIGINT)}} AS e
           FROM events),
h AS (SELECT user_id, list_sort(list(e)) AS h FROM e GROUP BY user_id)
SELECT user_id, CAST(len(h) AS BIGINT) AS n_events,
       CAST(list_reduce(list_transform(h, x -> x.v),
                        (a, b) -> (a + b) // 2) AS BIGINT) AS ewma_milli
FROM h ORDER BY user_id
"""


QUERIES = {
    "nd_target_encode": (nd_target_encode, _TARGET_ENCODE_ORACLE),
    "nd_ewma_smooth": (nd_ewma_smooth, _EWMA_ORACLE),
    "nd_profile": (nd_profile, _PROFILE_ORACLE),
    "nd_epoch_shuffle": (nd_epoch_shuffle, _EPOCH_ORACLE),
    "nd_epoch_manifest": (nd_epoch_manifest, _EPOCH_MANIFEST_ORACLE),
    "nd_hash_sample": (
        nd_hash_sample,
        "SELECT doc_id, lang FROM documents "
        "WHERE substring(md5(text), 1, 1) = '0' ORDER BY doc_id",
    ),
    "nd_stratified_sample": (
        nd_stratified_sample,
        "WITH ranked AS (SELECT doc_id, lang, "
        "ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY lang) AS n_lang FROM documents) "
        f"SELECT lang, doc_id FROM ranked "
        f"WHERE rn <= CEIL(n_lang * {STRATUM_FRAC}) "
        "ORDER BY lang, doc_id",
    ),
    "nd_train_split": (
        nd_train_split,
        "SELECT lang, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
        " < 'c' THEN 'train' "
        "WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' "
        "THEN 'val' ELSE 'test' END AS split, COUNT(*) AS n_docs "
        "FROM documents GROUP BY lang, split ORDER BY lang, split",
    ),
    "nd_unpivot": (
        nd_unpivot,
        "WITH wide AS (SELECT l_returnflag, SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, metric, value FROM ("
        "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide "
        "UNION ALL "
        "SELECT l_returnflag, 'sum_price', sum_price FROM wide) "
        "ORDER BY l_returnflag, metric",
    ),
    "nd_upsert": (
        nd_upsert,
        # Integer-cents audit: bigint sums are order-independent, unlike
        # ROUND(SUM(double), 2) which the fixture prices push onto a .005
        # boundary (see nd_upsert docstring). DuckDB's // on positive
        # bigints matches Spark's DIV exactly.
        "WITH base AS (SELECT o_orderkey, o_orderstatus, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, "
        "0 AS version FROM orders), "
        "updates AS (SELECT o_orderkey, o_orderstatus, "
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) * 11 // 10 AS cents, "
        "1 AS version FROM orders WHERE o_orderkey % 7 = 0), "
        "merged AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey "
        "ORDER BY version DESC) AS rn FROM "
        "(SELECT * FROM base UNION ALL SELECT * FROM updates)) "
        "SELECT o_orderstatus, COUNT(*) AS n, "
        "CAST(SUM(cents) AS BIGINT) AS total_cents FROM merged WHERE rn = 1 "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus",
    ),
    "nd_weighted_sample": (
        nd_weighted_sample,
        "WITH k AS (SELECT doc_id, lang, n_chars, "
        "ln((CAST(CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) "
        "AS DOUBLE) + 1.0) / 1152921504606846976.0) "
        "/ CAST(n_chars AS DOUBLE) AS wkey FROM documents) "
        "SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, n_chars FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY lang "
        "ORDER BY wkey DESC, doc_id) AS rn FROM k) t "
        "WHERE rn <= 3 ORDER BY lang, rn",
    ),
    "nd_histogram": (
        nd_histogram,
        "SELECT CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS bucket, "
        "COUNT(*) AS n, ROUND(MIN(o_totalprice), 2) AS lo, "
        "ROUND(MAX(o_totalprice), 2) AS hi "
        "FROM orders GROUP BY bucket ORDER BY bucket",
    ),
    "nd_above_group_avg": (
        nd_above_group_avg,
        "SELECT event_id, user_id, value, ROUND(user_avg, 6) AS user_avg "
        "FROM (SELECT event_id, user_id, value, "
        "AVG(value) OVER (PARTITION BY user_id) AS user_avg FROM events) t "
        "WHERE value > user_avg ORDER BY event_id",
    ),
    "nd_zscore": (
        nd_zscore,
        "SELECT doc_id, lang, n_chars, ROUND("
        "(n_chars - AVG(n_chars) OVER (PARTITION BY lang)) "
        "/ STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6) AS z "
        "FROM documents ORDER BY doc_id",
    ),
    "nd_gap_fill": (
        nd_gap_fill,
        "WITH ev AS (SELECT user_id, ts, value FROM events "
        "WHERE user_id < 20), "
        "b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS h0, "
        "date_trunc('hour', MAX(ts)) AS h1 FROM ev GROUP BY user_id), "
        "spine AS (SELECT user_id, unnest(generate_series(h0, h1, "
        "INTERVAL 1 HOUR)) AS hour FROM b), "
        "actual AS (SELECT user_id, date_trunc('hour', ts) AS hour, "
        "COUNT(*) AS n_events, ROUND(SUM(value), 3) AS sum_value "
        "FROM ev GROUP BY user_id, hour) "
        "SELECT s.user_id, s.hour, COALESCE(a.n_events, 0) AS n_events, "
        "COALESCE(a.sum_value, 0.0) AS sum_value "
        "FROM spine s LEFT JOIN actual a "
        "ON s.user_id = a.user_id AND s.hour = a.hour "
        "ORDER BY s.user_id, s.hour",
    ),
}
