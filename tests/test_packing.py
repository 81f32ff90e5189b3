"""Sequence packing & mixture reweighting invariants
(operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.packing import (
    mix_report,
    pack_sequences,
    packing_stats,
    weighted_mix,
)
from etl_deltalake_spark.operators.text import token_count
from etl_deltalake_spark.sources.catalog import load_table

BUDGET = 512


@pytest.fixture(scope="module")
def packed(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    return pack_sequences(
        docs, "doc_id", token_count("text"), budget=BUDGET, n_shards=4
    ).localCheckpoint(eager=True)


def test_per_doc_tokens_conserved(packed, spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    per_doc = packed.groupBy("doc", "n_tokens").agg(
        F.sum("tokens_in_bin").alias("got")
    )
    assert per_doc.filter(F.col("got") != F.col("n_tokens")).count() == 0
    # every doc with tokens appears
    n_docs = docs.filter(token_count("text") > 0).count()
    assert packed.select("doc").distinct().count() == n_docs


def test_all_bins_full_except_shard_last(packed):
    stats = packing_stats(packed, BUDGET)
    last = packed.groupBy("shard").agg(F.max("bin").alias("last_bin"))
    not_last = stats.join(
        last, (stats.shard == last.shard) & (stats.bin < last.last_bin)
    )
    assert not_last.filter(F.col("n_tokens") != BUDGET).count() == 0
    # no bin ever exceeds the budget, and fill is in (0, 1]
    assert stats.filter(F.col("n_tokens") > BUDGET).count() == 0
    assert stats.filter((F.col("fill") <= 0) | (F.col("fill") > 1)).count() == 0


def test_bins_contiguous_from_zero(packed):
    per_shard = packed.groupBy("shard").agg(
        F.min("bin").alias("lo"),
        F.max("bin").alias("hi"),
        F.countDistinct("bin").alias("n"),
    )
    bad = per_shard.filter(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
    )
    assert bad.count() == 0


def test_boundary_spanning_doc_splits_exactly():
    """A doc crossing a bin boundary contributes to both bins with
    the exact split."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(0, "a " * 300), (4, "b " * 300)], ["doc_id", "text"]
    )
    # one shard (ids 0,4 -> both % 1 == 0): offsets 0..300, 300..600
    out = {
        (r["doc"], r["bin"]): r["tokens_in_bin"]
        for r in pack_sequences(
            df, "doc_id", token_count("text"), budget=512, n_shards=1
        ).collect()
    }
    assert out == {(0, 0): 300, (4, 0): 212, (4, 1): 88}


def test_pack_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", token_count("text"), budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", token_count("text"), budget=8, n_shards=0)


def test_weighted_mix_rates_and_determinism(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = weighted_mix(docs, "doc_id", "source", weights)
    assert kept.filter(~F.col("source").isin(*weights)).count() == 0
    assert (
        kept.filter(F.col("source") == "src0").count()
        == docs.filter(F.col("source") == "src0").count()
    )
    assert kept.filter(F.col("source") == "src2").count() == 0
    # deterministic: second run selects the identical rows
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_mix(docs, "doc_id", "source", weights)
        .select("doc_id")
        .collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        weighted_mix(docs, "doc_id", "source", {"src0": 1.5})


def test_mix_report_covers_all_sources(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    rep = mix_report(docs, "doc_id", "source", {"src0": 1.0, "src1": 0.4})
    rows = {r["source"]: r for r in rep.collect()}
    assert set(rows) == {r["source"] for r in docs.select("source").distinct().collect()}
    assert rows["src0"]["rate"] == 1.0
    assert rows["src5"]["n_after"] == 0


def test_chunk_documents_boundaries_and_overlap(spark):
    from etl_deltalake_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "solo")], ["doc_id", "text"])
    out = {
        (r["doc"], r["chunk_idx"]): r
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=4, overlap=2
        ).collect()
    }
    # doc 1: stride 2, ceil((10-2)/2)=4 chunks at starts 0,2,4,6
    assert sorted(k for k in out if k[0] == 1) == [(1, i) for i in range(4)]
    assert out[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert out[(1, 1)]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert out[(1, 3)]["chunk_text"] == "w6 w7 w8 w9"
    assert out[(1, 3)]["chunk_start"] == 6
    assert all(out[(1, i)]["n_tokens"] == 4 for i in range(4))
    # short doc: one (possibly short) chunk
    assert out[(2, 0)]["chunk_text"] == "solo" and out[(2, 0)]["n_tokens"] == 1


def test_chunk_documents_token_conservation_no_overlap(spark, sf_dir):
    """With overlap=0 the chunks partition the token axis exactly."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.packing import chunk_documents
    from etl_deltalake_spark.operators.text import normalize_text
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    got = (
        chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=0)
        .groupBy("doc")
        .agg(F.sum("n_tokens").alias("n"))
    )
    want = docs.select(
        F.col("doc_id").alias("doc"),
        F.size(F.split(normalize_text("text"), " ")).cast("bigint").alias("m"),
    )
    assert got.join(want, "doc").filter(F.col("n") != F.col("m")).count() == 0


def test_chunk_documents_rejects_bad_args(spark):
    import pytest

    from etl_deltalake_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)


def test_chunk_documents_plan_is_scan_side(spark, sf_dir):
    """Chunking must be pure scan-side: zero exchanges, zero joins."""
    from etl_deltalake_spark.operators.packing import chunk_documents
    from etl_deltalake_spark.plans.inspect import plan_report
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    report = plan_report(chunk_documents(docs, "doc_id", "text"))
    assert report["exchanges"] == 0
    assert report["bnlj"] == 0 and report["cartesian"] == 0
    assert report["sort_merge_joins"] + report["hash_joins"] == 0


def test_sentence_chunks_greedy_rule(spark):
    """Greedy packing at budget 5: sentences of 3/3/2 tokens chunk as
    [s0] (3), [s1, s2] (3+2=5); an 8-token sentence occupies a chunk
    alone; nulls drop; the splitter is the UDTF's (shared
    definition)."""
    from etl_deltalake_spark.operators.packing import sentence_chunks

    df = spark.createDataFrame(
        [
            (1, "a b c. d e f! g h?"),
            (2, "w w w w w w w w. tail x"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc"], r["chunk_idx"], r["n_sentences"], r["n_tokens"],
         r["chunk_text"])
        for r in sentence_chunks(df, "doc_id", "text", budget_tokens=5)
        .collect()
    )
    assert rows == [
        (1, 0, 1, 3, "a b c."),
        (1, 1, 2, 5, "d e f! g h?"),
        (2, 0, 1, 8, "w w w w w w w w."),  # over budget, alone
        (2, 1, 1, 2, "tail x"),  # unterminated tail is a sentence
    ]


def test_sentence_chunks_validation(spark):
    import pytest

    from etl_deltalake_spark.operators.packing import sentence_chunks

    df = spark.createDataFrame([(1, "a.")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="budget_tokens"):
        sentence_chunks(df, "doc_id", "text", budget_tokens=0)
