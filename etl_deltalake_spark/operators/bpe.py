"""Distributed byte-pair-encoding (BPE) merge training — the
tokenizer-construction step of an LLM data pipeline, run as an
iterative DataFrame algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm).

No counterpart in the reference (its text surface is JSON field
extraction, main.py:1-638); north-star extension per SURVEY §2.9:
a corpus engine that prepares training data should also be able to
TRAIN the tokenizer over that corpus, not just count with one.

Shape per merge round (all JVM-side, zero Python UDFs):

  1. adjacent-pair counts: ``arrays_zip(slice(syms,1,n-1),
     slice(syms,2,n-1))`` exploded, weighted by word frequency —
     a map-side-combined groupBy whose shuffle carries (pair, count)
     rows only. The corpus itself is NEVER rescanned after the
     initial word-frequency aggregation: BPE's classic trick is that
     word shapes repeat, so training runs over the (word, freq)
     table — vocabulary-sized, not corpus-sized.
  2. argmax pair with a total tie-break (count DESC, left ASC,
     right ASC) — a 1-row limit collected to the driver. One
     codebook-sized round-trip per merge, the same documented
     trade as the Lloyd trainer (similarity.kmeans_codebook).
  3. greedy non-overlapping merge application via the ``aggregate``
     higher-order function: fold left over the symbol array,
     coalescing ``[... left] + right`` into ``[... left||right]``.
     Exactly Sennrich's left-to-right greedy semantics ("aaaa" with
     pair (a,a) → [aa, aa]), in whole-stage codegen.

Each round localCheckpoints the symbol table so the lineage stays
flat across ``num_merges`` iterations (the pagerank/label-propagation
pattern, operators/graph.py).

At 100 TB: step 1's shuffle is bounded by the distinct-pair count of
the vocabulary (Zipf-small); the corpus is touched exactly once, in
``word_freqs``. Tested against an independent pure-Python reference
implementation (tests/test_bpe.py) — merge sequences must be
identical, round for round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-split lowercased text — the ONE
    corpus-sized aggregation of BPE training; everything after runs
    on this vocabulary-sized table."""
    from etl_deltalake_spark.operators.text import word_tokens

    return (
        df.select(F.explode(word_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))"
    )
    return (
        syms.filter(F.size(F.col("syms")) >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of the adjacent
    pair (left, right) in every symbol array — a codegen fold, no
    Python in the loop."""
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return syms.select("word", "freq", merged.alias("syms"))


def bpe_train(
    words: DataFrame, num_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train ``num_merges`` BPE merges over a (word, freq) table.

    Returns (merges, final_symbols): merges as
    [(left, right, pair_count)] in rank order, and the symbol table
    after all merges (word, freq, syms) for vocabulary extraction.
    Stops early if no pair occurs twice (nothing left to compress).
    """
    syms = words.select(
        "word",
        "freq",
        # char split; Spark's split keeps a trailing '' element here
        F.filter(
            F.split(F.col("word"), "(?!^)"), lambda x: x != ""
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(syms)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < 2:
            break
        left, right, cnt = (
            top[0]["left"],
            top[0]["right"],
            int(top[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        syms = _apply_merge(syms, left, right).localCheckpoint(eager=True)
    return merges, syms


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a trained merge list to tokenize a corpus:
    (id, tokens array<string>, n_tokens). The merge list is
    rank-ordered; each word is re-tokenized by applying every merge
    in rank order with the same greedy left-to-right semantics as
    training.

    Execution: the merges ship to executors via closure broadcast
    (tokenizer-sized — thousands of pairs, not data) and apply inside
    ONE Arrow-batched pandas UDF with a per-batch word→tokens memo —
    Zipf repetition means most words hit the memo. This is the
    production encode path: k chained ``aggregate`` folds would plan
    k nested expressions; one vectorized kernel with memoization is
    both faster and rank-exact. Scan-side only: no shuffle, text
    never leaves its partition.
    """
    import re

    from pyspark.sql.functions import pandas_udf

    ranked = [(left, right) for left, right, *_ in merges]
    # Java's \\s is ASCII-only; Python's is Unicode-aware. Pin the
    # kernel to the exact character class word_freqs' Spark split
    # uses, or non-ASCII whitespace (U+00A0 etc.) would tokenize
    # differently between training and encoding.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    # functional pandas_udf form: this module uses stringified
    # annotations (future import), which break hint-based eval-type
    # inference — the two-arg form defaults to a scalar Arrow UDF
    def _encode(texts):
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                seq = list(w)
                for left, right in ranked:
                    if left not in seq:
                        continue
                    out: list[str] = []
                    i = 0
                    while i < len(seq):
                        if (
                            i + 1 < len(seq)
                            and seq[i] == left
                            and seq[i + 1] == right
                        ):
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(seq[i])
                            i += 1
                    seq = out
                got = memo[w] = seq
            return got

        return texts.map(
            lambda t: [
                tok
                for w in ws.split((t or "").lower())
                if w
                for tok in enc_word(w)
            ]
        )

    encode = pandas_udf(_encode, "array<string>")
    toks = encode(F.col(text_col))
    return df.select(
        F.col(id_col),
        toks.alias("tokens"),
    ).withColumn("n_tokens", F.size(F.col("tokens")).cast("bigint"))


def bpe_vocab(final_syms: DataFrame) -> DataFrame:
    """(token, freq) vocabulary from the trained symbol table —
    frequency-weighted count of every surviving subword token."""
    return (
        final_syms.select(
            "freq", F.explode(F.col("syms")).alias("token")
        )
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )
