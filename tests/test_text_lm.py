"""Bigram LM scoring invariants (operators/text.bigram_lm_scores).
The cross-engine value gate is the q_lm_score oracle in
tests/test_retired_queries.py; these pin the model semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.text import bigram_lm_scores, token_count
from etl_deltalake_spark.sources.catalog import load_table


def test_bigram_counts_and_score_range(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = bigram_lm_scores(docs, "doc_id", "text").localCheckpoint(eager=True)
    # docs with >= 2 tokens appear, each with n_bigrams = tokens - 1
    expect = docs.select(
        F.col("doc_id").alias("doc"),
        (token_count("text") - 1).alias("want"),
    ).filter(F.col("want") >= 1)
    joined = expect.join(out, "doc", "full")
    assert joined.filter(
        F.col("want").isNull()
        | F.col("n_bigrams").isNull()
        | (F.col("want") != F.col("n_bigrams"))
    ).count() == 0
    # log-probabilities are strictly negative
    assert out.filter(F.col("lm_score") >= 0).count() == 0


def test_repeated_bigrams_score_higher(spark):
    """A doc made of one repeated bigram must outscore a doc of the
    same length with all-distinct bigrams (higher = more probable)."""
    rows = [
        (1, "x y " * 20),
        (2, " ".join(f"w{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc"]: r["lm_score"]
        for r in bigram_lm_scores(df, "doc_id", "text").collect()
    }
    assert got[1] > got[2]
    assert all(math.isfinite(v) for v in got.values())


def test_nb_quality_scores_separates_held_out_classes(spark):
    """Behavioral gate for the NB quality classifier (round 9): train
    on a corpus with a clear lexical signal, then held-out docs of
    each kind must land on opposite sides of the margin, with OOV
    tokens absorbed by the fallback weight rather than crashing or
    skewing the verdict."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.text import nb_quality_scores

    prose = "the cat sat of the mat and it is nice to see"
    junk = "xqz9 zzkw 9911 #### @@@@ qqqq wwww"
    train = spark.createDataFrame(
        [(i, prose + f" extra{i}") for i in range(10)]
        + [(100 + i, junk + f" junk{i}") for i in range(10)],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [
            (1000, "the dog sat and it is good to stay"),  # prose-like
            (1001, "zzkw 9911 #### qqqq brandnewoov"),  # junk-like + OOV
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc"]: r
        for r in nb_quality_scores(
            train,
            score,
            "doc_id",
            "text",
            label=F.col("doc_id") < 100,
        ).collect()
    }
    assert out[1000]["pred"] is True and out[1000]["nb_margin"] > 0
    assert out[1001]["pred"] is False and out[1001]["nb_margin"] < 0
    assert out[1001]["n_terms"] > 0
