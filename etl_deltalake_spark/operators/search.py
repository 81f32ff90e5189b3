"""Full-text relevance search over ``documents.text``: inverted
index construction and BM25 ranking (SURVEY §2.9 text-analysis
extension — the retrieval counterpart of the TF-IDF scorer in
operators/text.py; absent in the reference, whose only text ops are
regex split/extract, reference main.py:219, 253-257).

Scale shape (the part that matters at 100 TB):
 - Document length is computed SCAN-SIDE from the text column
   (``token_count``), never from the exploded token table — the
   explode→filter→groupBy pipeline only ever sees rows whose term is
   in the query vocabulary, so the one shuffle ships
   O(matching doc-term pairs), not O(total tokens).
 - The query-term filter sits directly on the exploded token (a
   codegen'd IN over a literal list) and prunes before the shuffle.
 - Corpus constants (N, avgdl) are single-row aggregates
   broadcast via cross join — no driver round-trip in the plan.
 - Per-term BM25 partials are cast to DECIMAL(18,6) before the
   per-doc sum, so the reduction is order-insensitive and the DuckDB
   oracle reproduces it bitwise (same idiom as the decimal-cast sums
   in plans/queries.py).
 - ``build_inverted_index`` materializes term → postings-list for
   serving; posting arrays are sorted (doc order) for mergeability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.text import token_count, tokens


def doc_term_freqs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: Sequence[str] | None = None,
) -> DataFrame:
    """(doc, term, tf) table. With ``vocab`` the filter applies to the
    exploded token BEFORE the groupBy shuffle — at corpus scale the
    shuffle then carries only the query vocabulary's postings."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    if vocab is not None:
        toks = toks.filter(F.col("term").isin(list(vocab)))
    return toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))


def build_inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """term → (document frequency, postings array of (doc, tf) struct
    sorted by doc id). One explode + two grouped aggregations; the
    postings arrays are doc-sorted so shards merge with a linear
    zipper at serve time."""
    tf = doc_term_freqs(df, id_col, text_col)
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(
            F.collect_list(F.struct(F.col("doc"), F.col("tf")))
        ).alias("postings"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document matching ≥1 query term.

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson-Sparck
    Jones with the +1 floor — always positive), tf normalization
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)). All inputs to the float
    math are exact integers (tf, df, N, dl) or a ratio of exact
    integers (avgdl), and the per-doc reduction sums DECIMAL
    partials, so the score is deterministic across engines.
    """
    lens = df.select(
        F.col(id_col).alias("doc"), token_count(text_col).alias("dl")
    )
    consts = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtf = doc_term_freqs(df, id_col, text_col, vocab=query_terms)
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qtf.join(dfreq, "term")
        .join(lens, "doc")
        .crossJoin(F.broadcast(consts))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    partial = (idf * tf_norm).cast("decimal(18,6)")
    return (
        scored.select("doc", partial.alias("_s"))
        .groupBy("doc")
        .agg(F.sum("_s").cast("double").alias("score"))
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 hits with a deterministic (score desc, doc asc)
    rank. Round 9: the distributed top-k (TakeOrderedAndProject —
    per-partition heaps merged at k rows) runs FIRST, so the
    partition-less rank Window only ever sees ≤k rows, never the
    corpus-sized score table."""
    scores = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b)
    order = (F.col("score").desc(), F.col("doc").asc())
    top = scores.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(F.col("doc").alias(id_col), "score", "rank")
    )
