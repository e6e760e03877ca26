"""Sinks — deterministic writes with content manifests.

Reference capability: the "verifier" publishes a results folder to IPFS and
returns its CID (`pkg/verifier/ipfs/verifier.go:37-43`,
`pkg/ipfs/client.go:151`); clients fetch results back by CID
(`pkg/ipfs/client.go:117`). Spark-first restatement: ``df.write.parquet`` +
a *content manifest* — a single hash over the canonicalized rows — which
plays the CID's role: two runs publishing the same logical result produce
the same manifest hash regardless of partitioning. This is the primitive the
replicated-verification engine feature builds on (engine.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bacalhau_spark.catalog import table
from bacalhau_spark.functions import row_fingerprint


def result_manifest(df: DataFrame, metrics_out: dict | None = None) -> str:
    """Order- and partitioning-independent content hash of a DataFrame.

    Per-row sha256 fingerprints are reduced with a commutative sum, so no
    global sort is needed — each partition folds locally and the driver
    merges one row per partition. The reference's results CID analog.

    When `metrics_out` is given, the executed plan's SQLMetrics (scan bytes,
    shuffle bytes, spill) are folded into it — the manifest pass IS a full
    execution of the query, so its metrics describe the run.
    """
    fp = row_fingerprint([F.col(c) for c in df.columns])
    # fold the 256-bit hash as 4 xor-reduced bigints — keeps everything JVM-side
    chunks = [
        F.conv(F.substring(fp, 1 + i * 16, 16), 16, 10).cast("decimal(38,0)")
        for i in range(4)
    ]
    hashed = df.select(fp.alias("fp"), *[c.alias(f"c{i}") for i, c in enumerate(chunks)])
    agg_df = hashed.agg(
        F.count("*").alias("n"),
        # coalesce: SUM over zero rows is NULL — an empty result must still
        # manifest (as "0-0-0-0-0"), not crash the verifier.
        *[F.coalesce(F.sum(f"c{i}"), F.lit(0)).cast("decimal(38,0)")
          .alias(f"s{i}") for i in range(4)],
    )
    agg = agg_df.collect()[0]
    if metrics_out is not None:
        from bacalhau_spark.plans.telemetry import plan_metrics
        metrics_out.update(plan_metrics(agg_df))
        metrics_out["result_rows"] = int(agg["n"])
    return f"{agg['n']}-" + "-".join(f"{int(agg[f's{i}']):x}" for i in range(4))


def write_deterministic(df: DataFrame, path: str, sort_cols: list[str],
                        fmt: str = "parquet") -> str:
    """Publish a result: total-order sort, single output schema, manifest
    hash returned (the CID analog). Sorting before write makes the files
    byte-stable for a fixed partition count."""
    df.orderBy(*sort_cols).write.mode("overwrite").format(fmt).save(path)
    return result_manifest(df)


def q12_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem to a scratch sink, read it back, aggregate (Q12) —
    proves the write→read round trip is lossless (the reference's
    publish-then-Get loop, `cmd/bacalhau/docker_run.go:220-292`)."""
    from bacalhau_spark.scratch import scratch_dir
    li = table(spark, sf_dir, "lineitem")
    out = scratch_dir("q12") + "/lineitem"
    li.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


def nd_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink→source round trip with an explicit read schema (no runtime
    inference — the correctness-gate contract, SURVEY.md §1.2). The
    reference's data plane is textual (CSV sensor files,
    `testdata/awk_file.txt:1`); this is that plane done engine-side.
    Doubles survive via Spark's shortest-round-trip CSV formatting."""
    from bacalhau_spark.scratch import scratch_dir
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    out = scratch_dir("csv") + "/orders"
    orders.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE").option("header", True).csv(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("o_orderstatus")
    )


def nd_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink→source round trip (the control-plane wire format:
    job documents travel as JSON, `pkg/transport/libp2p/libp2p.go:214-233`).
    Explicit schema on re-read; the embedded `props` JSON string survives
    as an opaque field and stays queryable (get_json_object)."""
    from bacalhau_spark.scratch import scratch_dir
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props")
    out = scratch_dir("json") + "/events"
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING").json(out)
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 3).alias("total_value"),
             F.count(F.get_json_object("props", "$.k")).alias("n_with_k"))
        .orderBy("event_type")
    )


def nd_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink→source round trip (Spark 4 native xml format, rowTag
    records): the nation dim written as XML rows, re-read with an
    explicit schema, joined back into a per-region count — the
    interchange format enterprise feeds still arrive in."""
    from bacalhau_spark.scratch import scratch_dir
    nat = table(spark, sf_dir, "nation")
    out = scratch_dir("xml") + "/nation"
    (nat.write.mode("overwrite").format("xml")
     .option("rootTag", "nations").option("rowTag", "nation").save(out))
    back = (spark.read.schema(
        "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
        .option("rowTag", "nation").format("xml").load(out))
    return (
        back.groupBy("n_regionkey")
        .agg(F.count("*").alias("n_nations"),
             F.min("n_name").alias("first_nation"))
        .orderBy("n_regionkey")
    )


QUERIES = {
    "nd_xml_roundtrip": (
        nd_xml_roundtrip,
        "SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations, "
        "MIN(n_name) AS first_nation FROM nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey",
    ),
    "q12_roundtrip": (
        q12_roundtrip,
        "SELECT COUNT(*) AS n_rows, ROUND(SUM(l_extendedprice), 2) AS total "
        "FROM lineitem",
    ),
    "nd_csv_roundtrip": (
        nd_csv_roundtrip,
        "SELECT o_orderstatus, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) AS total "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    ),
    "nd_json_roundtrip": (
        nd_json_roundtrip,
        "SELECT event_type, COUNT(*) AS n, "
        "ROUND(SUM(value), 3) AS total_value, "
        "COUNT(json_extract_string(props, '$.k')) AS n_with_k "
        "FROM events GROUP BY event_type ORDER BY event_type",
    ),
}
