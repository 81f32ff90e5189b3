"""Corpus-preparation funnel: composition invariants on the
documents fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.corpus import (
    corpus_funnel,
    near_dup_keep_min,
    prepare_corpus,
)
from etl_deltalake_spark.operators.dedup import minhash_near_dup_pairs
from etl_deltalake_spark.operators.text import normalize_text, quality_score
from etl_deltalake_spark.sources.catalog import load_table

THRESHOLD = 0.6


def test_funnel_monotone_and_consistent(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    funnel = corpus_funnel(
        docs, min_quality=0.3, langs=["en", "es"], near_dup_threshold=THRESHOLD
    )
    names = [n for n, _ in funnel]
    counts = [c for _, c in funnel]
    assert names == ["raw", "quality", "lang", "exact_dedup", "near_dup"]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0
    # the end-to-end frame agrees with the funnel's last stage
    clean = prepare_corpus(
        docs, min_quality=0.3, langs=["en", "es"], near_dup_threshold=THRESHOLD
    )
    assert clean.count() == counts[-1]


def test_no_surviving_exact_or_near_duplicates(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    clean = prepare_corpus(docs, near_dup_threshold=THRESHOLD).localCheckpoint(
        eager=True
    )
    # exact: all normalized texts distinct
    n = clean.count()
    assert clean.select(F.md5(normalize_text("text"))).distinct().count() == n
    # near: the SAME detector finds nothing above threshold (every
    # pair edge lost a non-min endpoint; edges between cluster minima
    # cannot exist)
    leftover = minhash_near_dup_pairs(
        clean, "doc_id", "text", threshold=THRESHOLD
    )
    assert leftover.count() == 0


def test_filters_respected_and_columns_preserved(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    clean = prepare_corpus(docs, min_quality=0.3, langs=["en"])
    assert clean.columns == docs.columns
    bad = clean.filter(
        (quality_score("text") < 0.3) | (~F.col("lang").isNull() & F.lit(False))
    )
    assert bad.count() == 0


def test_near_dup_keep_min_keeps_singletons(spark):
    """Docs with no near-duplicate must pass through untouched."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "completely different text about other things entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sorted(r["doc_id"] for r in near_dup_keep_min(df, "doc_id", "text", 0.9).collect())
    assert out == [1, 3]


def test_substring_dup_interval_union(spark):
    """Hand-built coverage check: overlapping duplicated spans count
    once, non-duplicated docs report zero, and a short duplicated doc
    clips at its own length."""
    from etl_deltalake_spark.operators.dedup import substring_dup_stats

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words
    rows = [
        # docs 1/2 share a 6-word run -> 2 overlapping 5-gram starts
        # (pos 0,1) whose union covers all 6 words of doc 1
        (1, shared),
        (2, shared + " omega psi chi phi"),  # 10 words, 6 covered
        (3, "one two three four five six seven eight nine ten"),  # unique
        (4, "tiny shared doc"),  # < k words: single truncated gram
        (5, "tiny shared doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc"]: r
        for r in substring_dup_stats(df, "doc_id", "text", k=5).collect()
    }
    assert out[1]["n_dup_spans"] == 2 and out[1]["dup_span_frac"] == 1.0
    assert out[2]["n_dup_spans"] == 2 and out[2]["dup_span_frac"] == 0.6
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_span_frac"] == 0.0
    # truncated-gram doc: 1 span covering all 3 words, frac clips to 1
    assert out[4]["n_dup_spans"] == 1 and out[4]["dup_span_frac"] == 1.0
    assert out[5]["dup_span_frac"] == 1.0


def test_strip_duplicate_spans_keeps_canonical_copy(spark):
    """Span removal policy: the lowest doc holding a duplicated gram
    keeps its text; later docs lose exactly the covered words; unique
    text is untouched everywhere."""
    from etl_deltalake_spark.operators.dedup import strip_duplicate_spans

    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram
    rows = [
        (1, shared + " unique one"),
        (2, "prefix words here " + shared + " suffix tail"),
        (3, "totally different content with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc"]: r
        for r in strip_duplicate_spans(df, "doc_id", "text", k=5).collect()
    }
    # doc 1 is canonical: full text kept
    assert out[1]["clean_text"] == shared + " unique one"
    assert out[1]["n_kept"] == out[1]["n_words"] == 7
    # doc 2 loses the 5 shared words, keeps prefix+suffix
    assert out[2]["clean_text"] == "prefix words here suffix tail"
    assert (out[2]["n_words"], out[2]["n_kept"]) == (10, 5)
    # doc 3 untouched
    assert out[3]["n_kept"] == out[3]["n_words"]


def test_pagerank_semantics(spark):
    """Star graph: the hub outranks every leaf; symmetric pair ranks
    equal; all ranks positive and independent of edge-list order."""
    from etl_deltalake_spark.operators.graph import pagerank

    star = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    pair = [(10, 11), (11, 10)]
    df = spark.createDataFrame(star + pair, ["src", "dst"])
    out = {r["doc"]: r["rank"] for r in pagerank(df, iterations=6).collect()}
    assert all(v > 0 for v in out.values())
    assert all(out[0] > out[i] for i in range(1, 5))
    assert out[1] == out[2] == out[3] == out[4]
    assert out[10] == out[11]
    shuffled = spark.createDataFrame(
        list(reversed(pair + star)), ["src", "dst"]
    ).repartition(7)
    out2 = {r["doc"]: r["rank"] for r in pagerank(shuffled, iterations=6).collect()}
    assert out == out2  # partitioning/order never changes a bit
