"""HTML → text extraction contract (operators/html_text.py):
script/style/noscript/template content drops whole, comments and
declarations drop, character references decode, whitespace
normalizes to single-space token joins, malformed markup degrades
instead of raising, and the Spark column/DataFrame forms mirror the
pure function."""

from __future__ import annotations

from etl_deltalake_spark.operators.html_text import (
    extract_html_text,
    strip_html,
)


def test_strip_html_basic_contract():
    html = (
        "<html><head><title>Title Here</title>"
        '<script>var x = "<b>NOT text</b>";</script>'
        "<style>p { color: red }</style></head>"
        "<body><h1>A  Header</h1>\n<p>one <b>two</b>three</p>"
        "<!-- hidden -->"
        "<td>a</td><td>b</td></body></html>"
    )
    # tag boundaries separate tokens; inner whitespace collapses
    assert strip_html(html) == "Title Here A Header one two three a b"


def test_strip_html_entities_decode():
    assert strip_html("<p>fish &amp; chips &#233;clair &lt;tag&gt;</p>") == (
        "fish & chips éclair <tag>"
    )


def test_strip_html_nested_nontext_and_template():
    html = (
        "<div>keep1<noscript><p>dropped</p></noscript>"
        "<template><span>dropped too</span></template>keep2</div>"
    )
    assert strip_html(html) == "keep1 keep2"


def test_strip_html_malformed_never_raises():
    # unclosed tags, stray <, bad entity, truncated comment
    cases = [
        "<p>unclosed <b>bold",
        "3 < 5 and 7 > 2",
        "bad &entity; here",
        "<!-- never closed",
        "",
        "<script>never closed either",
    ]
    for c in cases:
        strip_html(c)  # must not raise
    assert strip_html("<p>unclosed <b>bold") == "unclosed bold"
    assert strip_html("") == ""


def test_extract_html_text_dataframe_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "<p>alpha  beta</p><div>gamma</div>"),
            (2, "<script>x</script>"),
            (3, None),
        ],
        ["doc_id", "page"],
    )
    out = {
        r["doc_id"]: r
        for r in extract_html_text(df, "doc_id", "page").collect()
    }
    assert out[1]["text"] == "alpha beta gamma"
    assert (out[1]["n_chars"], out[1]["n_words"]) == (16, 3)
    assert out[2]["text"] == "" and out[2]["n_words"] == 0
    assert out[3]["text"] is None


def test_html_extraction_feeds_corpus_funnel(spark, sf_dir):
    """End-to-end composition: crawl-shaped HTML pages → extract →
    the full curation funnel (quality → lang → exact dedup →
    near-dup) in ONE lazy plan. Two pages wrap the same document
    text in different markup — extraction must normalize them to
    identical text so exact dedup collapses the pair."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.corpus import prepare_corpus
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 30
    ).select("doc_id", "text")
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]

    def wrap_a(t):
        return f"<html><body><p>{t}</p></body></html>"

    def wrap_b(t):
        return (
            '<div class="art"><script>junk()</script>'
            f"<h1>{t}</h1><!-- c --></div>"
        )

    pages = spark.createDataFrame(
        [(d, wrap_a(t)) for d, t in rows]
        + [(d + 10_000, wrap_b(t)) for d, t in rows],
        ["doc_id", "page"],
    )
    from etl_deltalake_spark.operators.html_text import extract_html_text

    extracted = extract_html_text(pages, "doc_id", "page")
    cleaned = prepare_corpus(
        extracted, "doc_id", "text", min_quality=0.0, near_dup_threshold=1.01
    )
    kept = sorted(r["doc_id"] for r in cleaned.select("doc_id").collect())
    # markup variants of the same text collapse to ONE survivor each:
    # exact dedup keeps the min doc_id member (< 10_000)
    assert 0 < len(kept) <= len(rows)
    assert all(k < 10_000 for k in kept)
