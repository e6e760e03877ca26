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


def result_manifest(df: DataFrame) -> str:
    """Order- and partitioning-independent content hash of a DataFrame.

    Per-row sha256 fingerprints are reduced with a commutative sum, so no
    global sort is needed — each partition folds locally and the driver
    merges one row per partition. The reference's results CID analog.
    """
    fp = row_fingerprint([F.col(c) for c in df.columns])
    # fold the 256-bit hash as 4 xor-reduced bigints — keeps everything JVM-side
    chunks = [
        F.conv(F.substring(fp, 1 + i * 16, 16), 16, 10).cast("decimal(38,0)")
        for i in range(4)
    ]
    hashed = df.select(fp.alias("fp"), *[c.alias(f"c{i}") for i, c in enumerate(chunks)])
    agg = hashed.agg(
        F.count("*").alias("n"),
        # coalesce: SUM over zero rows is NULL — an empty result must still
        # manifest (as "0-0-0-0-0"), not crash the verifier.
        *[F.coalesce(F.sum(f"c{i}"), F.lit(0)).cast("decimal(38,0)")
          .alias(f"s{i}") for i in range(4)],
    ).collect()[0]
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
    import tempfile
    li = table(spark, sf_dir, "lineitem")
    out = tempfile.mkdtemp(prefix="bacalhau_spark_q12_") + "/lineitem"
    li.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


QUERIES = {
    "q12_roundtrip": (
        q12_roundtrip,
        "SELECT COUNT(*) AS n_rows, ROUND(SUM(l_extendedprice), 2) AS total "
        "FROM lineitem",
    ),
}
