"""Curation-operator semantics (operators/curation.py): repetition
signals, decontamination, quota sampling. Cross-engine value gates
are the q_repetition_stats / q_decontaminate / q_quota_sample oracles
in tests/test_retired_queries.py; these pin the operator semantics on
hand-built fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.curation import (
    contamination_report,
    decontaminate,
    quota_sample,
    repetition_stats,
)


def test_repetition_stats_hand_example(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),       # 5 words, 2 distinct; top 'a' x3
            (2, "x y z"),           # all distinct
            (3, "w w w w"),         # fully repeated
        ],
        ["doc_id", "text"],
    )
    out = {r["doc"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 5
    assert out[1]["dup_word_frac"] == 0.6          # 1 - 2/5
    assert out[1]["top_word_frac"] == 0.6          # 3/5
    # 2-grams of doc 1: ab ba ab ba -> 2 distinct of 4
    assert out[1]["dup_2gram_frac"] == 0.5
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["dup_word_frac"] == 0.75
    assert out[3]["top_word_frac"] == 1.0


def test_contamination_flags_exact_and_partial_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # full copy
            (2, "completely unrelated words here padding text"),
            (3, "prefix words then the quick brown fox appears"),  # partial
        ],
        ["doc_id", "text"],
    )
    rep = {
        r["doc"]: r["overlap_frac"]
        for r in contamination_report(
            corpus, bench, "doc_id", "text", k=3, threshold=0.0
        ).collect()
    }
    assert rep[1] == 1.0
    assert rep[2] == 0.0
    assert 0.0 < rep[3] < 1.0
    cleaned = decontaminate(corpus, bench, "doc_id", "text", k=3, threshold=0.5)
    assert sorted(r["doc_id"] for r in cleaned.collect()) == [2, 3]


def test_quota_sample_caps_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], ["doc_id", "source"]
    )
    out = quota_sample(df, "source", "doc_id", 10)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {"s0": 10, "s1": 10, "s2": 10}
    # deterministic: same rows on re-run and after a repartition
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in quota_sample(df.repartition(7), "source", "doc_id", 10).collect()
    )
    assert ids1 == ids2
    # under-quota groups keep everything
    small = quota_sample(df.filter(F.col("doc_id") < 5), "source", "doc_id", 10)
    assert small.count() == 5
    with pytest.raises(ValueError, match="quota"):
        quota_sample(df, "source", "doc_id", 0)


def test_contamination_plan_broadcasts_bench_no_self_join(spark, sf_dir):
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    plan = contamination_report(
        corpus, bench, "doc_id", "text", k=3, threshold=0.05
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_hash_split_fractions_and_determinism(spark, sf_dir):
    from etl_deltalake_spark.operators.curation import hash_split
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n = docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    assert counts["train"] > counts.get("val", 0)
    # stable under growth: a subset's assignments equal the full run's
    sub = hash_split(
        docs.filter(F.col("doc_id") < 100), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_hash_split_rejects_bad_fractions(spark, sf_dir):
    from etl_deltalake_spark.operators.curation import hash_split
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, "doc_id", {"train": 1.2, "val": -0.2})


def test_hash_split_zero_fraction_split_gets_nothing(spark, sf_dir):
    """A zero-fraction split must receive NO rows — a trailing zero
    previously overflowed the 12-hex cutoff and leaked ~half the
    corpus into it."""
    from etl_deltalake_spark.operators.curation import hash_split
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = hash_split(docs, "doc_id", {"train": 0.5, "val": 0.5, "test": 0.0})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("test", 0) == 0
    assert counts["train"] + counts["val"] == docs.count()
    # both live splits actually receive rows at fixture scale
    assert counts["train"] > 0 and counts["val"] > 0


def test_quota_sample_two_phase_identical_with_giant_source(spark):
    """One source dwarfs every partition (the case the pre-cap
    exists for): the two-phase form must select EXACTLY the rows the
    single-phase window selects, across partitionings."""
    from etl_deltalake_spark.operators.curation import quota_sample_two_phase

    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        # src_big: 2800 rows; two small sources share the rest
        F.when(F.col("id") < 2800, F.lit("src_big"))
        .when(F.col("id") % 2 == 0, F.lit("src_a"))
        .otherwise(F.lit("src_b"))
        .alias("source"),
        (F.col("id") * 7 % 101).alias("payload"),
    )
    for parts in (1, 13):
        d = df.repartition(parts)
        base = sorted(
            tuple(r) for r in quota_sample(d, "source", "doc_id", 25).collect()
        )
        two = sorted(
            tuple(r)
            for r in quota_sample_two_phase(d, "source", "doc_id", 25).collect()
        )
        assert two == base
        assert len(two) == 25 + 25 + 25


def test_quota_sample_two_phase_small_groups_pass_through(spark):
    """Groups under quota survive intact (pre-cap must not drop)."""
    from etl_deltalake_spark.operators.curation import quota_sample_two_phase

    df = spark.range(0, 8).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("source")
    ).repartition(5)
    out = quota_sample_two_phase(df, "source", "doc_id", 50).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(8))


def test_negative_samples_contract(spark):
    """No self-negatives, exactly k draws per anchor, in-range ids,
    deterministic across partitionings, dense-id validation raises."""
    import pytest as _pytest

    from etl_deltalake_spark.operators.curation import negative_samples

    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    out = negative_samples(df, "doc_id", k=3).collect()
    assert len(out) == 600
    assert all(r["neg_id"] != r["doc_id"] for r in out)
    assert all(0 <= r["neg_id"] < 200 for r in out)
    out2 = negative_samples(df.repartition(13), "doc_id", k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    with _pytest.raises(ValueError, match="dense ids"):
        negative_samples(
            df.filter(F.col("doc_id") % 2 == 0), "doc_id", k=3
        ).collect()


def test_weighted_sample_favors_heavy_weights(spark, sf_dir):
    """Weight-proportional draw: the sampled docs' mean length must
    exceed the corpus mean (longer docs get proportionally higher
    inclusion probability), the draw is exactly n without
    replacement, and reruns reproduce it bit-for-bit."""
    from etl_deltalake_spark.operators.curation import weighted_sample
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "n_chars", F.length("text").cast("double")
    )
    s1 = weighted_sample(docs, "doc_id", "n_chars", n=150)
    rows = s1.select("doc_id", "n_chars").collect()
    assert len(rows) == 150
    assert len({r["doc_id"] for r in rows}) == 150  # no replacement
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean
    rows2 = weighted_sample(docs, "doc_id", "n_chars", n=150).select(
        "doc_id"
    ).collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in rows2}


def test_weighted_sample_plans_take_ordered(spark, sf_dir):
    """The draw must compile to TakeOrderedAndProject (per-partition
    top-n heap + driver merge), not a global sort or single-partition
    window — the shape that survives 100 TB."""
    from etl_deltalake_spark.operators.curation import weighted_sample
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "n_chars", F.length("text").cast("double")
    )
    s = weighted_sample(docs, "doc_id", "n_chars", n=50)
    s.count()
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
