"""URL / domain curation — the first stage of a crawl-data pipeline.

Reference intent: the reference's only web-facing plane is the
`urldownload` storage provider (`pkg/storage/url/urldownload/storage.go:1-120`),
which fetches a URL into a mounted volume but never inspects it. A
training-data pipeline over crawl data needs the inspection stages that
come BEFORE any fetch: URL canonicalization (tracking-param strip, host
case-fold, default-port and fragment removal), per-domain caps (no single
host dominating the corpus), and domain blocklists. Each is expressed
Spark-first:

- canonicalization is a pure per-row regexp chain (RE2-compatible subset,
  identical automata in Spark and DuckDB) — zero shuffle, whole-stage
  codegen, composes unchanged over readStream sources;
- the per-domain cap is ONE window per domain (row_number over doc_id) —
  the honest shuffle; at corpus scale a hot domain is the classic skewed
  key, and the cap-K selection degrades gracefully: a per-partition
  partial top-K before the window (or AQE skew split) bounds any single
  task, because only K survivors per (partition, domain) can matter;
- the blocklist is a broadcast LEFT ANTI join against the (small, here
  literal) blocked-domain table — the real shape at scale, where a
  blocklist of millions of hosts is still MBs broadcast to every
  executor, never a shuffle of the corpus.

The fixture documents carry `source` but no URL, so each query derives a
deterministic URL from (source, doc_id) — the nd_pii_redact synthesis
convention: mixed-case scheme/host, a :443 default port on doc_id % 5,
utm_* tracking params on doc_id % 3, a #fragment on doc_id % 4 — and the
canonicalization machinery is what's under test, identically stated in
the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bacalhau_spark.catalog import table

DOMAIN_CAP = 3
# Blocked domains: two full sources' shard-domains plus one single shard
# domain — enough shapes to prove the anti join semantics.
BLOCKED_DOMAINS = tuple(
    [f"src2-{i}.example.com" for i in range(7)]
    + [f"src11-{i}.example.com" for i in range(7)]
    + ["src5-3.example.com"])

# Deterministic URL synthesis from (source, doc_id) — stated once here
# and once (identically) in _URL_SQL.
_URL_SQL = (
    "'HTTPS://WWW.' || source || '-' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.Example.COM' || "
    "CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END || "
    "'/p/' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || "
    "CAST(doc_id AS VARCHAR) || '&utm_campaign=c' "
    "ELSE '?id=' || CAST(doc_id AS VARCHAR) END || "
    "CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END")


def _url_expr() -> Column:
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("HTTPS://WWW."), F.col("source"), F.lit("-"),
        (F.col("doc_id") % 7).cast("string"), F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), did,
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("?utm_source=feed&id="), did,
                        F.lit("&utm_campaign=c")))
        .otherwise(F.concat(F.lit("?id="), did)),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")))


# Canonicalization chain. Patterns are the RE2-compatible subset (char
# classes, anchors, non-capturing groups — no lookaround), so Spark's
# Java regex and DuckDB's RE2 compile identical automata. DuckDB's
# regexp_replace is first-match-only by default — the oracle passes 'g'
# where Spark's always-global semantics need it (the tracking-param pass,
# where several params can repeat); single-anchor passes need no flag.
_TRACK = "(?:utm_[a-z]+|fbclid|gclid)"


def url_canonicalize_frame(urls: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """(doc_id, url) -> (doc_id, url, canon, domain): strip the fragment,
    lowercase scheme+host (path/query case is significant and kept),
    drop the :443 default port, strip tracking params (utm_*, fbclid,
    gclid) wherever they sit in the query string, and derive the
    registrable domain (host minus any www. prefix). Pure per-row
    codegen; composes unchanged over readStream sources."""
    u = F.col(url_col)
    nofrag = F.regexp_replace(u, "#.*", "")
    sh = F.lower(F.regexp_extract(nofrag, "^[A-Za-z]+://[^/?#]*", 0))
    sh = F.regexp_replace(sh, ":443$", "")
    rest = F.regexp_replace(nofrag, "^[A-Za-z]+://[^/?#]*", "")
    rest = F.regexp_replace(rest, _TRACK + "=[^&#]*&", "")
    rest = F.regexp_replace(rest, "[?&]" + _TRACK + "=[^&#]*$", "")
    rest = F.regexp_replace(rest, r"\?$", "")
    canon = F.concat(sh, rest)
    domain = F.regexp_replace(
        F.regexp_extract(canon, "^[a-z]+://([^/?#]*)", 1), r"^www\.", "")
    # passthrough of the input columns so callers can carry metadata
    # (source, fetch time, ...) through the stage without a re-join
    return urls.select("*", canon.alias("canon"),
                       domain.alias("domain"))


def _canon_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return url_canonicalize_frame(
        docs.select("doc_id", _url_expr().alias("url")))


def nd_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized URL per document: (doc_id, url, canon, domain)."""
    return (_canon_frame(spark, sf_dir)
            .select("doc_id", "url", "canon", "domain")
            .orderBy("doc_id"))


def nd_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus cap: keep at most DOMAIN_CAP documents per
    registrable domain (deterministic survivor rule: lowest doc_id
    first), report (domain, n_docs, n_kept) — the anti-domination stage
    every crawl pipeline runs before training. One window shuffle keyed
    on domain; see the module docstring for the hot-domain skew story."""
    ranked = _canon_frame(spark, sf_dir).select(
        "domain",
        F.row_number().over(
            Window.partitionBy("domain").orderBy("doc_id")).alias("rn"))
    return (ranked.groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum((F.col("rn") <= DOMAIN_CAP).cast("long"))
                 .cast("long").alias("n_kept"))
            .orderBy("domain"))


def nd_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast blocklist filter: probe the canonicalized corpus
    against the blocked-domain table, reporting per-source
    (n_docs, n_kept, n_blocked). The blocklist side is an actual
    DataFrame (not an IN literal) joined with an explicit broadcast —
    the shape that still works when the blocklist is millions of rows:
    corpus never shuffles, the block table ships once per executor.
    The FILTERING form is a broadcast LEFT ANTI join; this AUDIT form
    marks instead of dropping (broadcast left join + a block flag) so
    kept and blocked tally in ONE corpus scan + one source-keyed agg —
    the first cut anti-joined then re-joined docs by doc_id for the
    source column, a whole corpus shuffle the passthrough frame
    eliminates (round-10 crossover A/B)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    canon = url_canonicalize_frame(
        docs.select("doc_id", "source", _url_expr().alias("url")))
    # literal dim via inline(array(struct)) — createDataFrame would plan
    # as a Python-RDD scan outside codegen (the round-1 range-join 27x
    # lesson); at real scale the blocklist is a read table, same join
    blocked = spark.range(1).select(F.inline(F.array(*[
        F.struct(F.lit(d).alias("domain"), F.lit(1).alias("blk"))
        for d in BLOCKED_DOMAINS])))
    marked = canon.join(F.broadcast(blocked), "domain", "left")
    return (marked.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("blk").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_kept"),
                 F.sum(F.coalesce("blk", F.lit(0))).cast("long")
                 .alias("n_blocked"))
            .orderBy("source"))


# --- oracles -----------------------------------------------------------------
_CANON_SQL = f"""
u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
c1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nofrag FROM u),
c2 AS (SELECT doc_id, url,
  regexp_replace(lower(regexp_extract(nofrag, '^[A-Za-z]+://[^/?#]*')),
                 ':443$', '') AS sh,
  regexp_replace(nofrag, '^[A-Za-z]+://[^/?#]*', '') AS rest FROM c1),
c3 AS (SELECT doc_id, url, sh,
  regexp_replace(regexp_replace(regexp_replace(rest,
    '{_TRACK}=[^&#]*&', '', 'g'),
    '[?&]{_TRACK}=[^&#]*$', ''),
    '\\?$', '') AS rest3 FROM c2),
canon AS (SELECT doc_id, url, sh || rest3 AS canon,
  regexp_replace(regexp_extract(sh || rest3, '^[a-z]+://([^/?#]*)', 1),
                 '^www\\.', '') AS domain FROM c3)"""

_URL_CANON_ORACLE = f"""
WITH {_CANON_SQL}
SELECT doc_id, url, canon, domain FROM canon ORDER BY doc_id
"""

_DOMAIN_CAP_ORACLE = f"""
WITH {_CANON_SQL},
r AS (SELECT domain,
      ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
      FROM canon)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM r GROUP BY domain ORDER BY domain
"""

_BLOCK_LIST_SQL = ", ".join(f"('{d}')" for d in BLOCKED_DOMAINS)

_DOMAIN_BLOCK_ORACLE = f"""
WITH {_CANON_SQL},
blocked(domain) AS (VALUES {_BLOCK_LIST_SQL}),
kept AS (SELECT c.doc_id FROM canon c
         WHERE c.domain NOT IN (SELECT domain FROM blocked))
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked
FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
GROUP BY d.source ORDER BY d.source
"""

QUERIES = {
    "nd_url_canonicalize": (nd_url_canonicalize, _URL_CANON_ORACLE),
    "nd_domain_cap": (nd_domain_cap, _DOMAIN_CAP_ORACLE),
    "nd_domain_blocklist": (nd_domain_blocklist, _DOMAIN_BLOCK_ORACLE),
}
