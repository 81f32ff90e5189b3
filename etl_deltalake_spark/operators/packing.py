"""Sequence packing & dataset mixing for training-data pipelines
(SURVEY §2.9 extension surface — ops a pretraining corpus pipeline
runs after curation).

``pack_sequences`` implements concatenate-and-chunk packing: within a
shard, documents are laid end-to-end on a token axis and sliced into
fixed ``budget``-token context windows (bins). A document spanning a
bin boundary contributes tokens to both bins — exactly the
GPT-style packing model, and fully expressible with window cumsum +
sequence/explode, no Python.

``weighted_mix`` implements deterministic mixture reweighting: each
source keeps a fixed fraction of its rows, selected by a stable
modulus rule on the id so re-runs and the SQL oracle reproduce the
same sample.

Scale shape:
- Packing's only shuffle is the per-shard window sort, and the rows
  entering it are (id, n_tokens) pairs — the text column never
  shuffles. Each shard's window sorts ~N/n_shards tiny rows; set
  ``n_shards`` to cluster parallelism at 100 TB. A single global
  ordering (n_shards=1) would serialize the cumsum on one task —
  that is the anti-pattern sharding exists to avoid.
- Mixing is a scan-side filter after a broadcast join against a
  weights table of |sources| rows; no shuffle of the fact side.

The shard rule (``id % n_shards``) and sampling rule
(``id % granularity < weight*granularity``) are modulus- not
hash-based so a SQL oracle on another engine derives the identical
partition; production can swap in ``F.xxhash64`` for balance on
non-uniform ids (documented trade: engine-specific hashes are not
cross-engine reproducible).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens: Column,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document to the ``budget``-token bins it occupies.

    Output: one row per (doc, bin) with
      doc         document id
      shard       packing shard (id % n_shards)
      bin         0-based bin index within the shard
      tokens_in_bin  tokens this doc contributes to this bin
      n_tokens    the doc's total token count
      start_off   the doc's start offset on the shard's token axis

    Invariants (asserted in tests/test_packing.py): per-doc
    tokens_in_bin sums to n_tokens; every bin except a shard's last
    holds exactly ``budget`` tokens; bins are contiguous from 0.
    Zero-token docs occupy no bin and are dropped.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    base = df.select(
        F.col(id_col).alias("doc"),
        (F.col(id_col) % n_shards).cast("bigint").alias("shard"),
        tokens.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = base.select(
        "doc",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_off"),
    ).withColumn("end_off", F.col("start_off") + F.col("n_tokens"))
    first_bin = F.floor(F.col("start_off") / budget)
    last_bin = F.floor((F.col("end_off") - 1) / budget)
    exploded = offs.filter(F.col("n_tokens") > 0).withColumn(
        "bin", F.explode(F.sequence(first_bin, last_bin))
    )
    lo = F.greatest(F.col("start_off"), F.col("bin") * budget)
    hi = F.least(F.col("end_off"), (F.col("bin") + 1) * budget)
    return exploded.select(
        "doc",
        "shard",
        F.col("bin").cast("bigint").alias("bin"),
        (hi - lo).cast("bigint").alias("tokens_in_bin"),
        "n_tokens",
        "start_off",
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-(shard, bin) fill report over ``pack_sequences`` output:
    docs in the bin, tokens, and fill ratio (round 6). The curation
    dashboard view — one groupBy shuffle on (shard, bin)."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens_in_bin").alias("n_tokens"),
        )
        .select(
            "shard",
            "bin",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.lit(float(budget)), 6).alias("fill"),
        )
    )


def weighted_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: Mapping[str, float],
    granularity: int = 1000,
) -> DataFrame:
    """Deterministic mixture reweighting: keep a ``weights[source]``
    fraction of each source's rows (sources absent from ``weights``
    are dropped). Selection is ``id % granularity <
    round(weight * granularity)`` — stable across runs and engines.

    The weights ship as a broadcast-joined lookup of |sources| rows
    (the C2 dict-remap pattern at scale); the fact side is filtered
    scan-side with no shuffle.
    """
    for s, wt in weights.items():
        if not 0.0 <= wt <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {wt}")
    spark = df.sparkSession
    wrows = [(s, int(round(wt * granularity))) for s, wt in weights.items()]
    wtab = spark.createDataFrame(wrows, [source_col, "_keep_below"])
    return (
        df.join(F.broadcast(wtab), source_col)
        .filter((F.col(id_col) % granularity) < F.col("_keep_below"))
        .drop("_keep_below")
    )


def mix_report(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: Mapping[str, float],
    granularity: int = 1000,
) -> DataFrame:
    """Per-source before/after row counts and achieved rate for a
    ``weighted_mix`` configuration — the report a curator reads to
    confirm the realized mixture. One aggregation over each frame."""
    before = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_before"))
    after = (
        weighted_mix(df, id_col, source_col, weights, granularity)
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        before.join(after, source_col, "left")
        .na.fill(0, ["n_after"])
        .select(
            source_col,
            "n_before",
            "n_after",
            F.round(F.col("n_after") / F.col("n_before"), 6).alias("rate"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the chunking step a pretraining/RAG pipeline runs before packing
    or embedding (stride = chunk_tokens - overlap; the final window
    may be short; a doc shorter than one window yields one chunk).

    Output: (doc, chunk_idx, chunk_start, n_tokens, chunk_text) with
    chunk_start the 0-based token offset and chunk_text the
    space-joined window. Tokenization is the whitespace split of the
    normalized text (the same axis quality/lang/shingle operators
    use), so chunk boundaries agree with the rest of the curation
    stack.

    Scale shape: entirely scan-side — normalize → split once
    (attribute-bound, the CollapseProject rule dedup.shingle_rows
    documents), window offsets via ``sequence`` + explode, window
    content via ``slice``. Zero shuffles, zero UDFs; text is read
    once per doc and only the emitted chunks leave the scan.
    """
    from etl_deltalake_spark.operators.text import normalize_text

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    w = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(text_col), " ").alias("words"),
    )
    wcol = F.col("words")
    # number of windows: ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(
        F.greatest(F.size(wcol) - overlap, F.lit(1)) / F.lit(stride)
    ).cast("int")
    exploded = w.select(
        "doc",
        wcol,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    piece = F.slice(F.col("words"), start + 1, chunk_tokens)
    return exploded.select(
        "doc",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        start.cast("bigint").alias("chunk_start"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


SENTENCE_CHUNK_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("n_sentences", IntegerType()),
        StructField("n_tokens", LongType()),
        StructField("chunk_text", StringType()),
    ]
)


def sentence_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int = 128,
) -> DataFrame:
    """SENTENCE-AWARE chunking (round 8): split each document on the
    shared sentence definition (operators/udfs.sentence_spans_py —
    one rule for span extraction AND chunking) and greedily pack
    consecutive sentences into chunks of at most ``budget_tokens``
    whitespace tokens. A sentence is never split mid-way: one longer
    than the budget occupies a chunk alone (the RAG/pretraining
    convention — semantic boundaries beat exact budget fit, and the
    fixed-window ``chunk_documents`` remains the budget-exact
    alternative).

    Greedy rule (deterministic, the property the oracle replays as a
    recursive running-sum-with-reset): append the next sentence to
    the current chunk iff the chunk's token count plus the
    sentence's stays within budget, else start a new chunk with it.

    Output: one row per (doc, chunk_idx) with the sentence count,
    token count, and the space-joined chunk text. Arrow-batched
    mapInPandas, fan-out inside the kernel, zero shuffles."""
    import pandas as pd

    from etl_deltalake_spark.operators.text import sentence_spans_py

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")

    def kernel(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                sents = [seg for _, _, seg in sentence_spans_py(str(text))]
                chunk: list[str] = []
                acc = 0
                idx = 0

                def flush():
                    nonlocal chunk, acc, idx
                    if chunk:
                        rows.append(
                            (
                                int(doc), idx, len(chunk), acc,
                                " ".join(chunk),
                            )
                        )
                        idx += 1
                        chunk, acc = [], 0

                for seg in sents:
                    w = len(seg.split())
                    if chunk and acc + w > budget_tokens:
                        flush()
                    chunk.append(seg)
                    acc += w
                flush()
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc", "chunk_idx", "n_sentences", "n_tokens",
                    "chunk_text",
                ],
            ).astype(
                {
                    "doc": "int64",
                    "chunk_idx": "int32",
                    "n_sentences": "int32",
                    "n_tokens": "int64",
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    )
    return src.mapInPandas(kernel, schema=SENTENCE_CHUNK_SCHEMA)
