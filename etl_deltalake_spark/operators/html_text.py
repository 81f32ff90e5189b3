"""HTML → text extraction: the canonical pretraining-corpus
preparation step (web crawl dumps are HTML; the model trains on
text), stdlib-only via ``html.parser`` (SURVEY §2.9 extensions).

Contract (deterministic, the property the oracle grades):
 - every text node OUTSIDE ``script``/``style``/``noscript``/
   ``template`` elements contributes, in document order; markup
   inside those containers is dropped whole;
 - comments, processing instructions, and declarations are dropped;
 - character references decode (``&amp;`` → ``&``, ``&#65;`` → A) —
   the parser's ``convert_charrefs`` path;
 - the output is the whitespace-NORMALIZED token join: split every
   contributed text node on whitespace, join all tokens with single
   spaces. Tag boundaries therefore always separate tokens —
   ``<td>a</td><td>b</td>`` yields ``a b`` — which is the behavior a
   token-counting / dedup pipeline wants (layout-independent).

This is intentionally a TEXT EXTRACTOR, not a readability engine:
boilerplate removal (nav/header/footer pruning, main-content
detection) is a modeling choice layered on top (the quality-scoring
and repetition operators in this repo do that statistically);
extraction itself must be deterministic and total.

Execution: one Arrow-batched pandas UDF (scan-side, zero shuffle) —
HTMLParser is a sequential per-document state machine, the same
shape as the media codecs. A malformed fragment never raises:
``html.parser`` is the stdlib's error-tolerant (HTML5-style)
tokenizer, so stray ``<``, unclosed tags, and bad entities degrade
to text or get skipped, and extraction stays total over a crawl.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Containers whose character data is NOT prose (code, styling,
# inert templates) — dropped whole, per the extraction contract.
NON_TEXT_ELEMENTS = frozenset(("script", "style", "noscript", "template"))


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.tokens: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in NON_TEXT_ELEMENTS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in NON_TEXT_ELEMENTS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.tokens.extend(data.split())


def strip_html(html_str: str) -> str:
    """Extract whitespace-normalized text from an HTML fragment or
    document (pure function — the kernel and tests share it)."""
    p = _TextExtractor()
    p.feed(html_str)
    p.close()
    return " ".join(p.tokens)


def html_to_text(text_col: str | Column) -> Column:
    """Column form: Arrow-batched pandas UDF applying ``strip_html``
    per row (null in → null out). Scan-side only — at 100 TB this
    runs where the crawl partition lives, no shuffle."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _kernel(s):
        return s.map(lambda v: None if v is None else strip_html(v))

    fn = pandas_udf(_kernel, "string")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return fn(c)


def extract_html_text(
    df: DataFrame, id_col: str, html_col: str, out_col: str = "text"
) -> DataFrame:
    """DataFrame form: id + extracted text + token/char counts — the
    drop-in front of the corpus funnel (quality → lang-id → dedup
    operate on ``out_col`` exactly as they do on plain text)."""
    out = df.select(
        F.col(id_col),
        html_to_text(html_col).alias(out_col),
    )
    return out.select(
        id_col,
        out_col,
        F.length(out_col).cast("long").alias("n_chars"),
        F.when(F.length(out_col) == 0, F.lit(0).cast("long"))
        .otherwise(F.size(F.split(F.col(out_col), " ")).cast("long"))
        .alias("n_words"),
    )
