"""URL / domain curation plane (operators/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bacalhau_spark.operators import web


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_canonicalize_is_pure_mapper(spark, sf_dir):
    """Canonicalization must stay per-row codegen: no Python eval, no
    exchange beyond the presentation sort."""
    plan = _plan(web.nd_url_canonicalize(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("rangepartitioning" in ln for ln in exchanges), plan


def test_domain_blocklist_broadcasts_block_side(spark, sf_dir):
    """The blocklist probe must be ONE corpus scan against a broadcast
    of the block table — no Python-RDD literal scan, no shuffle except
    the source agg + presentation sort, exactly one documents read."""
    plan = _plan(web.nd_domain_blocklist(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "Scan ExistingRDD" not in plan
    assert plan.count("documents.parquet") <= 2  # one scan node (2 prints)


def test_canonicalize_is_idempotent(spark, sf_dir):
    """canon(canon(url)) == canon(url): a second pass over an already-
    canonical URL changes nothing — the property that lets the stage be
    re-run safely anywhere in a pipeline."""
    once = web._canon_frame(spark, sf_dir).select(
        "doc_id", F.col("canon").alias("url"))
    twice = web.url_canonicalize_frame(once)
    diff = twice.where(F.col("canon") != F.col("url")).count()
    assert diff == 0


def test_canonical_urls_lowercase_host_keep_path_case(spark, sf_dir):
    rows = web.nd_url_canonicalize(spark, sf_dir).limit(50).collect()
    for r in rows:
        host = r.canon.split("://")[1].split("/")[0]
        assert host == host.lower()
        assert "#" not in r.canon and "utm_" not in r.canon
        assert ":443" not in r.canon
        assert r.domain and not r.domain.startswith("www.")


def test_domain_cap_counts(spark, sf_dir):
    rows = web.nd_domain_cap(spark, sf_dir).collect()
    assert all(r.n_kept == min(r.n_docs, web.DOMAIN_CAP) for r in rows)


def test_blocklist_blocks_exactly_blocked_sources(spark, sf_dir):
    """src2 and src11 have ALL their shard-domains blocked; src5 only its
    doc_id%7==3 shard; everyone else keeps everything."""
    rows = {r.source: r for r in
            web.nd_domain_blocklist(spark, sf_dir).collect()}
    for src, r in rows.items():
        if src in ("src2", "src11"):
            assert r.n_kept == 0 and r.n_blocked == r.n_docs
        elif src == "src5":
            assert 0 < r.n_kept < r.n_docs
        else:
            assert r.n_blocked == 0 and r.n_kept == r.n_docs
