"""Capstone integration: the WHOLE crawl→training pipeline chained
end-to-end through the real operators — WARC container parse → HTTP
split → URL canonicalization + frontier dedup → HTML→text extraction
→ the curation funnel (quality floor → exact dedup → LSH near-dup)
→ blocklist safety audit → sentence-aware chunking → deterministic
shard manifest. Each stage is individually oracle- or pytest-gated
elsewhere; THIS test pins that a user can actually run them as one
pipeline: row counts flow consistently, the whole thing is
deterministic run-to-run, and the composed plan stays free of
quadratic joins."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.corpus import prepare_corpus
from etl_deltalake_spark.operators.curation import (
    blocklist_report,
    shard_manifest,
)
from etl_deltalake_spark.operators.html_text import html_to_text
from etl_deltalake_spark.operators.packing import sentence_chunks
from etl_deltalake_spark.operators.urls import dedup_by_canonical_url
from etl_deltalake_spark.operators.warc import (
    encode_warc,
    encode_warc_gz,
    warc_records,
)
from etl_deltalake_spark.plans.inspect import plan_report
from etl_deltalake_spark.sources.catalog import load_table

N_DOCS = 30


def _crawl_fixture(spark, sf_dir):
    """Synthetic crawl: one WARC per seed doc with 2 responses; URLs
    collide across seeds (d and d+1 share site keys) so frontier
    dedup has real work; page text includes sentence punctuation so
    chunking has boundaries to respect."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id").limit(
        N_DOCS
    )

    def page(d: int, r: int) -> str:
        words = " ".join(
            f"w{(d * 7 + r * 29 + i * 13) % 97}" for i in range(30)
        )
        return (
            f"<html><body><h1>site{(d + r) % 5}</h1>"
            f"<p>{words}. {words}! tail{d % 3}?</p></body></html>"
        )

    def make_warc(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                recs = [
                    {
                        "warc_type": "response",
                        # (d + r) % 5 collides across seeds on purpose
                        "url": f"HTTP://SITE{(d + r) % 5}.EXAMPLE:80/p",
                        "html": page(d, r),
                    }
                    for r in range(2)
                ]
                # round 11: odd seeds arrive as .warc.gz (the real
                # Common Crawl transport) — the capstone proves the
                # whole corpus pipeline runs from gzip members too
                enc = encode_warc_gz if d % 2 else encode_warc
                payloads.append(enc(recs))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(make_warc, schema="doc_id long, payload binary")


def _run_pipeline(spark, sf_dir):
    archives = _crawl_fixture(spark, sf_dir)
    responses = warc_records(archives, "doc_id", "payload").filter(
        F.col("warc_type") == "response"
    )
    pages = responses.select(
        (F.col("doc_id") * 10 + F.col("rec_idx")).alias("page_id"),
        "url",
        html_to_text(F.decode("body", "utf-8")).alias("text"),
    )
    frontier = dedup_by_canonical_url(pages, "page_id", "url")
    corpus = prepare_corpus(
        frontier.select("page_id", "text"),
        id_col="page_id",
        text_col="text",
        min_quality=0.0,
        near_dup_threshold=0.95,
    )
    audited = blocklist_report(
        corpus,
        "page_id",
        "text",
        corpus.sparkSession.createDataFrame([("tail0",)], "term string"),
        max_hits=0,
    )
    kept = corpus.join(
        audited.filter(F.col("kept")).select("page_id"), "page_id"
    )
    chunks = sentence_chunks(kept, "page_id", "text", budget_tokens=40)
    manifest = shard_manifest(
        kept.select("page_id"), "page_id", n_shards=4
    )
    return pages, frontier, corpus, audited, kept, chunks, manifest


def test_pipeline_counts_flow_consistently(spark, sf_dir):
    pages, frontier, corpus, audited, kept, chunks, manifest = _run_pipeline(
        spark, sf_dir
    )
    n_pages = pages.count()
    assert n_pages == 2 * N_DOCS
    n_frontier = frontier.count()
    # URL collisions across seeds guarantee real frontier dedup
    assert 0 < n_frontier < n_pages
    n_corpus = corpus.count()
    assert 0 < n_corpus <= n_frontier
    assert audited.count() == n_corpus  # audit covers every survivor
    n_kept = kept.count()
    n_blocked = audited.filter(~F.col("kept")).count()
    assert n_kept == n_corpus - n_blocked
    assert n_blocked > 0  # tail0 occurs in a third of the pages
    # every kept page chunks into >= 1 chunk; every page gets a shard
    assert chunks.select("doc").distinct().count() == n_kept
    assert manifest.count() == n_kept
    shards = manifest.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("maxpos")
    )
    for r in shards.collect():  # positions are contiguous 1..n
        assert r["maxpos"] == r["n"]


def test_pipeline_is_deterministic_and_plan_clean(spark, sf_dir):
    """Two independent builds must agree row-for-row (no rand(), no
    first-seen nondeterminism survives to the output), and the
    composed chunk plan must stay free of quadratic joins."""
    _, _, _, _, _, chunks_a, manifest_a = _run_pipeline(spark, sf_dir)
    _, _, _, _, _, chunks_b, manifest_b = _run_pipeline(spark, sf_dir)
    ca = sorted(tuple(r) for r in chunks_a.collect())
    cb = sorted(tuple(r) for r in chunks_b.collect())
    assert ca == cb
    ma = sorted(tuple(r) for r in manifest_a.collect())
    mb = sorted(tuple(r) for r in manifest_b.collect())
    assert ma == mb
    report = plan_report(chunks_a)
    assert report["bnlj"] == 0 and report["cartesian"] == 0
