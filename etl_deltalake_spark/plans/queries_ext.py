"""Extension query plans: text analysis, dedup, similarity search,
multimodal plumbing, and streaming batch-equivalents (SURVEY §2.9 +
§2.8 streaming row).

Same contract as plans/queries.py: ``q_*(spark, sf_dir) ->
DataFrame``, column aliases matching plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_deltalake_spark.sources.catalog import load_table


def _dec(c, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


# ------------------------------------------------------------ text analysis

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals (SURVEY §2.9 text analysis)."""
    from etl_deltalake_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.word_count("text").alias("n_words"),
        T.stopword_ratio("text").alias("stop_ratio"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.quality_score("text").alias("quality"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (SURVEY §2.9)."""
    from etl_deltalake_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", "lang", T.lang_id("text").alias("lang_pred"))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (SURVEY §2.9)."""
    from etl_deltalake_spark.operators.text import tfidf_table

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        tfidf_table(docs, "doc_id", "text", top_k=3)
        .select(F.col("doc").alias("doc_id"), "term", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: normalized md5 + min-shingle hash
    (codegen'd exploded-shingle path — operators/text.py)."""
    from etl_deltalake_spark.operators.text import fingerprint_table

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return fingerprint_table(docs, "doc_id", "text", k=5).select(
        F.col("doc").alias("doc_id"), "fp", "shingle_fp"
    )


# ------------------------------------------------------------------- dedup

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy (SURVEY §2.9).

    Deliberately NO pre-repartition (unlike q_minhash_lsh): the map
    side is ONE md5 per row — microseconds per document — so there
    is nothing to parallelize that the scan's own splits don't
    already cover (parquet splits at maxPartitionBytes, so a real
    lake scan has thousands of partitions). Shuffling the raw text
    to spread a trivial map was measurably slower at every scale
    tried (round-4 profile: the extra exchange roughly tripled the
    query at sf0.1). The only data shuffle is the groupBy on 32-char
    fingerprints — raw text never moves."""
    from etl_deltalake_spark.operators.dedup import exact_dedup_stats

    docs = load_table(spark, "documents", sf_dir)
    return exact_dedup_stats(docs, "doc_id", "text")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (SURVEY §2.9)."""
    from etl_deltalake_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact verification (§2.9).

    The fixture parquet is one small file → one input partition, so
    repartition by doc id first; on a real lake the scan already has
    thousands of splits and this is a no-op to omit."""
    from etl_deltalake_spark.operators.dedup import minhash_near_dup_pairs

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, num_perm=16, bands=4, threshold=0.5
    ).orderBy("doc_a", "doc_b")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash+LSH pairs → 4-round min-label
    propagation → (doc, cluster) (SURVEY §2.9 — the iterative step
    that turns pairwise near-dups into keep-one groups).

    Pair generation goes through the sub-quadratic LSH path (band
    equi-join candidates, exact verify) — the wiring a 100 TB corpus
    needs; the exact shared-shingle generator (dedup.jaccard_pairs)
    remains the q_jaccard_pairs baseline."""
    from etl_deltalake_spark.operators.dedup import (
        label_propagation_clusters,
        minhash_near_dup_pairs,
    )

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, num_perm=16, bands=4, threshold=0.5
    )
    return label_propagation_clusters(pairs, "doc_a", "doc_b", iterations=4).orderBy(
        "doc"
    )


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-preparation funnel (SURVEY §2.9 composed):
    quality floor → language allowlist → exact dedup (keep min id) →
    MinHash+LSH near-dup keep-one (operators/corpus.py). The oracle
    re-derives every stage in SQL, so the full composition — not just
    each stage — is cross-engine verified.

    Scale shape: the two filters are scan-side column predicates, the
    exact dedup shuffles 32-char fingerprints, and the near-dup stage
    runs LSH band equi-joins on the already-shrunk survivor set —
    never all-pairs, no driver-side data."""
    from etl_deltalake_spark.operators.corpus import prepare_corpus

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    clean = prepare_corpus(
        docs,
        id_col="doc_id",
        text_col="text",
        min_quality=0.3,
        langs=["en", "es"],
        near_dup_threshold=0.5,
        quality_col="quality",
    )
    return clean.select("doc_id", "lang", "quality").orderBy("doc_id")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signatures (SURVEY §2.9; codegen'd groupBy
    path — operators/dedup.simhash_table)."""
    from etl_deltalake_spark.operators.dedup import simhash_table
    from etl_deltalake_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return simhash_table(docs, "doc_id", tokens("text")).select(
        F.col("doc").alias("doc_id"), "simhash"
    )


def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py): per-user
    daily buckets, gap-filled grid, last-observation-carried-forward
    values — the resample/ffill surface over the events stream.
    Carried doubles pass through untouched so the oracle comparison
    is bitwise."""
    from etl_deltalake_spark.operators.timeseries import resample_locf

    ev = load_table(spark, "events", sf_dir)
    return (
        resample_locf(
            ev, "user_id", "ts", "value", step="1 day", tiebreak_col="event_id"
        )
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id", "bucket")
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM quality scoring (operators/text.py
    bigram_lm_scores — the relational KenLM-style filter): add-one
    smoothed bigram MLE trained on the corpus itself, per-doc mean
    log-probability. DECIMAL-exact summation keeps the mean
    order-independent so the oracle matches bitwise."""
    from etl_deltalake_spark.operators.text import bigram_lm_scores

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        bigram_lm_scores(docs, "doc_id", "text")
        .select(F.col("doc").alias("doc_id"), "n_bigrams", "lm_score")
        .orderBy("doc_id")
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing into 512-token context
    windows across 4 shards (operators/packing.py — SURVEY §2.9
    training-data surface). One row per (doc, bin) with the token
    span the doc contributes; the oracle re-derives the whole token
    axis in SQL."""
    from etl_deltalake_spark.operators.packing import pack_sequences
    from etl_deltalake_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir)
    return pack_sequences(
        docs, "doc_id", token_count("text"), budget=512, n_shards=4
    ).orderBy("doc", "bin")


def q_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture reweighting report (operators/packing.py
    weighted_mix/mix_report): per-source before/after counts and the
    achieved rate under a fixed weights table. Sources absent from
    the weights drop to zero — visible in the report, as a curator
    needs."""
    from etl_deltalake_spark.operators.packing import mix_report

    docs = load_table(spark, "documents", sf_dir)
    weights = {"src0": 1.0, "src1": 0.6, "src2": 0.3, "src3": 0.0}
    return mix_report(docs, "doc_id", "source", weights, granularity=1000).orderBy(
        "source"
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document
    (operators/curation.repetition_stats): dup-word, dup-2gram, and
    top-word fractions — the boilerplate/spam gate a curation
    pipeline applies before dedup."""
    from etl_deltalake_spark.operators.curation import repetition_stats

    docs = load_table(spark, "documents", sf_dir)
    return repetition_stats(docs, "doc_id", "text").orderBy("doc")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination report
    (operators/curation.contamination_report): corpus docs whose
    3-gram shingle sets overlap the benchmark slice (doc_id % 97 = 0)
    above 5% — the GPT-3-style n-gram leak check. The bench gram set
    broadcasts; the corpus is never self-joined."""
    from etl_deltalake_spark.operators.curation import contamination_report

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(
        corpus, bench, "doc_id", "text", k=3, threshold=0.05
    ).orderBy("doc")


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota sampling
    (operators/curation.quota_sample): at most 40 docs per source,
    chosen by md5(doc_id) order — reproducible across engines and
    re-partitions, no RNG."""
    from etl_deltalake_spark.operators.curation import quota_sample

    docs = load_table(spark, "documents", sf_dir)
    return quota_sample(docs, "source", "doc_id", 40).select(
        "doc_id", "source"
    ).orderBy("doc_id")


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking
    (operators/packing.chunk_documents): 32-token windows, 8-token
    overlap — entirely scan-side (sequence/explode/slice), zero
    shuffles; the pre-embedding / pre-packing step."""
    from etl_deltalake_spark.operators.packing import chunk_documents

    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8
    ).orderBy("doc", "chunk_idx")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment
    (operators/curation.hash_split, 80/10/10 by md5(doc_id) hex
    range): scan-side expression, no RNG, stable under corpus
    growth."""
    from etl_deltalake_spark.operators.curation import hash_split

    docs = load_table(spark, "documents", sf_dir)
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split").orderBy("doc_id")


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff (operators/reconcile.table_diff): left =
    customers sans % 13 keys, right = customers sans % 17 keys with
    the segment swapped for % 7 — classifies every key added/removed/
    changed/unchanged in one full-outer key join (the migration /
    version reconciliation check)."""
    from etl_deltalake_spark.operators.reconcile import table_diff

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    left = cust.filter(F.col("c_custkey") % 13 != 0)
    right = cust.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    return table_diff(left, right, ["c_custkey"]).orderBy("c_custkey")


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (operators/reconcile.profile_columns):
    null/distinct/min/max for five orders columns in a single
    aggregation over one scan."""
    from etl_deltalake_spark.operators.reconcile import profile_columns

    orders = load_table(spark, "orders", sf_dir)
    return profile_columns(
        orders,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            "o_orderdate",
        ],
    ).orderBy("col_name")


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (operators/expectations.check):
    five rules over orders evaluated in ONE aggregation pass (plus the
    uniqueness groupBy) — the dbt-test/Deequ surface, generalizing the
    reference's arity guard (main.py:209-210)."""
    from etl_deltalake_spark.operators import expectations as X

    orders = load_table(spark, "orders", sf_dir)
    return X.check(
        orders,
        [
            X.not_null("o_orderkey"),
            X.unique("o_orderkey"),
            X.accepted_values("o_orderstatus", ["O", "F", "P"]),
            X.in_range("o_totalprice", 0.0, 100000.0),
            X.row_count_between(1, 1000),
        ],
    ).orderBy("rule")


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history (operators/scd.scd2_merge): load
    the customer dimension (keys with custkey % 11 != 0) at
    2024-01-01, then merge a 2024-02-01 batch that changes the
    segment for custkey % 7 == 0 and introduces the % 11 keys —
    changed keys get a closed row + a new open row, unchanged keys
    keep their original row, new keys open. One key-shuffle join."""
    from etl_deltalake_spark.operators.scd import scd2_init, scd2_merge

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    b1 = cust.filter(F.col("c_custkey") % 11 != 0).withColumn(
        "eff", F.lit("2024-01-01")
    )
    t1 = scd2_init(b1, ["c_custkey"], ["c_mktsegment"], "eff")
    b2 = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).withColumn("eff", F.lit("2024-02-01"))
    t2 = scd2_merge(t1, b2, ["c_custkey"], ["c_mktsegment"], "eff")
    return t2.orderBy("c_custkey", "valid_from")


# -------------------------------------------------------- similarity search

_VEC_CACHE: dict[str, list[float]] = {}
_CENTROID_CACHE: dict[str, list[tuple[int, list[float]]]] = {}
_PQ_CACHE: dict[str, list[list[tuple[int, list[float]]]]] = {}
_KMEANS_CACHE: dict[str, list[tuple[int, list[float]]]] = {}


def reset_similarity_session_caches() -> None:
    """Bench hook (round 15, VERDICT r14 #6): clear the session
    codebook/probe memos so every timed bench rep performs its row's
    FULL declared computation — training collects included — instead
    of rep 2 reusing rep 1's codebooks and shaving the training out
    of the reported min. The persisted ANN-index / MinHash-store
    paths (_ANN_INDEX_CACHE, _NEARDUP_STORE_CACHE) are NOT cleared:
    those are the queries' declared INPUTS (pre-existing serving
    state), not part of any row's computation."""
    for c in (_VEC_CACHE, _CENTROID_CACHE, _PQ_CACHE, _KMEANS_CACHE):
        c.clear()


def _pq_books(
    spark: SparkSession, sf_dir: str
) -> list[list[tuple[int, list[float]]]]:
    """The PQ codebook artifact shared by q_pq_topk and q_ivfpq_topk:
    trained once per session per sf_dir (the _CENTROID_CACHE
    posture — codebooks are session artifacts, the collect is
    m × ksub × dsub floats, never data rows). ONE owner for the
    training parameters so the two queries can't silently diverge;
    bench.py's queries_first_run keeps the cold-training cost
    visible."""
    if sf_dir not in _PQ_CACHE:
        from etl_deltalake_spark.operators.similarity import pq_train

        emb = load_table(spark, "embeddings", sf_dir)
        _PQ_CACHE[sf_dir] = pq_train(
            emb, "vec_id", "embedding", dims=64, m=4, ksub=8, iterations=2
        )
    return _PQ_CACHE[sf_dir]


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """Probe vector (vec_id=0), memoized per sf_dir: the lookup is
    metadata-sized (one d-float row) and folds into the plan as
    literals, so repeated query runs reuse one driver fetch."""
    if sf_dir not in _VEC_CACHE:
        row = (
            load_table(spark, "embeddings", sf_dir)
            .filter(F.col("vec_id") == 0)
            .select("embedding")
            .head()
        )
        _VEC_CACHE[sf_dir] = [float(x) for x in row.embedding]
    return _VEC_CACHE[sf_dir]


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> list[tuple[int, list[float]]]:
    """Deterministic IVF codebook (every 50th vector), memoized per
    sf_dir — the collect is codebook-only (nlist×d floats), never
    data rows, and now happens once per session instead of per call."""
    if sf_dir not in _CENTROID_CACHE:
        cents = (
            load_table(spark, "embeddings", sf_dir)
            .filter(F.col("vec_id") % 50 == 0)
            .select("vec_id", "embedding")
            .collect()
        )
        _CENTROID_CACHE[sf_dir] = [
            (int(r.vec_id), [float(x) for x in r.embedding]) for r in cents
        ]
    return _CENTROID_CACHE[sf_dir]


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against vec_id=0 (SURVEY §2.9)."""
    from etl_deltalake_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    return cosine_topk(emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=10)


def q_ann_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5 against vec_id=0 — the scale path
    (touches ~1/256 of rows; SURVEY §2.9)."""
    from etl_deltalake_spark.operators.similarity import bucketed_ann_topk

    emb = load_table(spark, "embeddings", sf_dir)
    return bucketed_ann_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf_dir), k=5, planes=8
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-5: nearest-centroid coarse quantization,
    probe the query's cluster only (SURVEY §2.9 similarity scale
    path alongside q_ann_bucket).

    The codebook here is a deterministic subsample (every 50th
    vector) so the DuckDB oracle re-derives the identical partition
    — honest recall accounting. Production swaps in seeded k-means
    centroids; the collect is the codebook only (nlist×d floats,
    driver-resident by design), never data rows."""
    from etl_deltalake_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    return ivf_topk(
        emb,
        "vec_id",
        "embedding",
        _query_vec(spark, sf_dir),
        centroids,
        k=5,
        nprobe=1,
    ).select("vec_id", "cluster_id", "cos_sim")


def q_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's vectorized-UDF escape hatch, oracle-verified:
    Arrow-batched pandas UDFs computing character and space counts
    (SURVEY §2.6 — the general extension surface replacing the
    reference's iterrows loops, main.py:502, 537-539). Row-at-a-time
    Python UDFs are banned from hot paths; this is the sanctioned
    shape when an expression genuinely needs Python."""
    from etl_deltalake_spark.operators.udfs import n_chars, n_spaces

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        n_chars("text").alias("n_chars"),
        n_spaces("text").alias("n_spaces"),
    )


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets —
    the sub-quadratic wired plan (SURVEY §2.9 dedup family; threshold
    tuned to the fixture's cosine range — synthetic vectors have no
    true dups). Candidate generation is an equi-join on
    (table, bucket); exact cosine verifies candidates only. The exact
    all-pairs baseline (similarity.cosine_near_dup_pairs) remains as
    an unregistered correctness reference."""
    from etl_deltalake_spark.operators.similarity import bucketed_near_dup_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    dims = len(_query_vec(spark, sf_dir))
    return bucketed_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.42, dims=dims, planes=4, tables=3
    ).orderBy("id_a", "id_b")


# ------------------------------------------------------ multimodal plumbing

def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: byte length + content checksum
    (SURVEY §2.9 multimodal). The decode stage itself is the gated
    stub in operators/multimodal.py; this exercises the typed-binary
    scan path end-to-end."""
    docs = load_table(spark, "documents", sf_dir)
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary
    payloads — format-agnostic byte-level kernel
    (operators/multimodal.py); see q_media_decode for the REAL PNG
    pixel decode path."""
    from pyspark.sql.types import BinaryType

    from etl_deltalake_spark.operators.multimodal import map_payload_features

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id", F.col("text").cast(BinaryType()).alias("payload")
    )
    return map_payload_features(media, "doc_id", "payload", frame_size=64).select(
        "doc_id", "n_bytes", "checksum", F.col("n_frames").cast("int").alias("n_frames")
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the Arrow mapInPandas kernel: 4 evenly
    spaced 64-byte frames per payload, checksummed — the DuckDB
    oracle re-derives each frame with substr arithmetic, so the
    Python kernel's slicing is cross-engine verified (documents are
    ASCII: char offsets == byte offsets)."""
    from pyspark.sql.types import BinaryType

    from etl_deltalake_spark.operators.multimodal import sample_frames

    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id", F.col("text").cast(BinaryType()).alias("payload")
    )
    frames = sample_frames(media, "doc_id", "payload", frame_size=64, n_frames=4)
    return frames.select(
        "doc_id", "frame_idx", "frame_offset", F.md5("frame").alias("frame_md5")
    ).orderBy("doc_id", "frame_idx")


# --------------------------------------------- streaming batch-equivalents

def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (SURVEY §2.8 streaming).

    Batch-equivalent of the Structured Streaming pipeline in
    streaming/pipeline.py — same F.window expression; the streaming
    test proves parity between the two paths.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming path: readStream over the events
    parquet → tumbling windowed agg → availableNow drain to a memory
    sink (streaming/pipeline.py). Shares q_tumbling_window's oracle —
    stream and batch must agree exactly."""
    import tempfile

    from etl_deltalake_spark.streaming import pipeline as P

    stream = P.read_events_stream(spark, sf_dir, sf_dir)
    ckpt = tempfile.mkdtemp(prefix="sgraft_q_stream_")
    import uuid

    name = f"t_{uuid.uuid4().hex[:12]}"
    q = (
        P.tumbling_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("window_start", "event_type")


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes (SURVEY §2.8) — each
    event lands in exactly two windows."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user (SURVEY §2.8)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
        .orderBy("user_id", "session_start")
    )


# ------------------------------------------------------------ round 3: search / rolling / regression

def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term query (SURVEY §2.9
    text analysis — retrieval counterpart of q_tfidf)."""
    from etl_deltalake_spark.operators.search import bm25_topk

    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(
        docs, "doc_id", "text", ("spark", "window", "merge"), k=20
    ).orderBy("rank")


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling mean/std + z-score anomaly flag per
    user over the events stream (time-series telemetry shape)."""
    from etl_deltalake_spark.operators.timeseries import rolling_stats

    ev = load_table(spark, "events", sf_dir)
    return rolling_stats(
        ev, "user_id", "ts", "value", window_secs=3600, z_threshold=2.0
    ).select(
        F.col("key").alias("user_id"),
        "ts", "value", "n_win", "mean_win", "std_win", "z", "is_anomaly",
    ).orderBy("user_id", "ts", "value")


def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier OLS fit of extendedprice on quantity — the
    regr_slope/intercept/r2 aggregate family from exact sufficient
    statistics (operators/stats.grouped_linreg)."""
    from etl_deltalake_spark.operators.stats import grouped_linreg

    li = load_table(spark, "lineitem", sf_dir)
    return grouped_linreg(
        li, ["l_suppkey"], "l_quantity", "l_extendedprice"
    ).orderBy("l_suppkey")


def q_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd-trained IVF assignment (k=4, 2 iterations) over the
    embeddings table — the iterative-algorithm surface, fully
    oracle-gated because every step is a pure function of the data
    (deterministic seeds + decimal-sum means). Training runs the
    broadcast-refresh form — the codebook stays in a k-row DataFrame
    across iterations, no per-iteration stats collect — which is
    bitwise-identical to the collect-form
    (operators/similarity.kmeans_codebook_df)."""
    from etl_deltalake_spark.operators.similarity import (
        ivf_assign,
        kmeans_codebook_df,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    # trained codebook is a session artifact, memoized per sf_dir
    # (the _CENTROID_CACHE/_PQ_CACHE posture; deterministic, so the
    # cache can't change results — first-run cost stays visible in
    # bench.py's queries_first_run)
    if sf_dir not in _KMEANS_CACHE:
        _KMEANS_CACHE[sf_dir] = kmeans_codebook_df(
            emb, "vec_id", "embedding", k=4, iterations=2
        )
    centroids = _KMEANS_CACHE[sf_dir]
    return (
        ivf_assign(emb, "vec_id", "embedding", centroids, sim_col="cos_sim")
        .select("vec_id", "cluster_id", "cos_sim")
        .orderBy("vec_id")
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag equi-width histogram of lineitem quantity —
    single-pass profiling aggregation (operators/stats.histogram)."""
    from etl_deltalake_spark.operators.stats import histogram

    li = load_table(spark, "lineitem", sf_dir)
    return histogram(
        li, "l_quantity", lo=0.0, hi=50.0, n_buckets=10,
        group_cols=["l_returnflag"],
    ).orderBy("l_returnflag", "bucket")


def q_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs sketch median per returnflag with a bounded-error
    verdict (operators/stats.approx_percentile_check — the quantile
    twin of q_approx_distinct's honest-sketch contract)."""
    from etl_deltalake_spark.operators.stats import approx_percentile_check

    li = load_table(spark, "lineitem", sf_dir)
    return approx_percentile_check(
        li, ["l_returnflag"], "l_quantity", prob=0.5
    ).orderBy("l_returnflag")


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the language distribution over
    documents (operators/stats.value_entropy) — the key-skew /
    dedup-potential profiling signal."""
    from etl_deltalake_spark.operators.stats import value_entropy

    docs = load_table(spark, "documents", sf_dir)
    return value_entropy(docs, ["source"], "lang").orderBy("source")


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join completeness (SURVEY §2.8 joins row): order
    counts per customer vs a high-balance customer subset — both
    unmatched sides survive null-extended. Shuffle hash/sort-merge
    on the key like any equi-join; no new scale shape."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 9000
    ).select("c_custkey", "c_name")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        per_cust.join(
            cust, per_cust.o_custkey == cust.c_custkey, "full_outer"
        )
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            "c_name",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("o_custkey").isNotNull().alias("has_orders"),
            F.col("c_custkey").isNotNull().alias("high_balance"),
        )
        .orderBy("custkey")
    )


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-10 for vec_id=0: L2 Lloyd
    codebooks per subspace (m=4, ksub=8, 2 iterations) → compressed
    codes → asymmetric-distance scoring over codes only. The whole
    train→encode→score pipeline is deterministic, so the oracle
    re-derives it bitwise (operators/similarity.pq_*)."""
    from etl_deltalake_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    books = _pq_books(spark, sf_dir)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    return pq_adc_topk(
        codes, "vec_id", _query_vec(spark, sf_dir), books, k=10
    ).orderBy("rank")


def q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature scaling over lineitem quantity/price: z-score and
    min-max columns from one exact-decimal stats pass
    (operators/stats.standardize)."""
    from etl_deltalake_spark.operators.stats import standardize

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return standardize(li, ["l_quantity", "l_extendedprice"]).orderBy(
        "l_orderkey", "l_linenumber"
    )


def q_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile discretization of order totals with per-bucket
    counts (operators/stats.quantile_bucket): equi-depth buckets
    from exact percentile cutpoints."""
    from etl_deltalake_spark.operators.stats import quantile_bucket

    orders = load_table(spark, "orders", sf_dir)
    return (
        quantile_bucket(orders, "o_totalprice", n_buckets=4)
        .groupBy("qbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("lo"),
            F.max(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("hi"),
        )
        .orderBy("qbucket")
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase over the
    events stream (operators/behavior.funnel_counts): each step
    counts only events at-or-after the user's previous step."""
    from etl_deltalake_spark.operators.behavior import funnel_counts

    ev = load_table(spark, "events", sf_dir)
    return funnel_counts(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).orderBy("step_idx")


def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over the events stream
    (operators/behavior.cohort_retention)."""
    from etl_deltalake_spark.operators.behavior import cohort_retention

    ev = load_table(spark, "events", sf_dir)
    return cohort_retention(ev, "user_id", "ts", period="week").orderBy(
        "cohort", "offset"
    )


def q_copair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part co-occurrence pairs across orders (market-basket
    primitive, operators/relational.cooccurrence_pairs), capped and
    deterministically ranked."""
    from etl_deltalake_spark.operators.relational import cooccurrence_pairs

    li = load_table(spark, "lineitem", sf_dir)
    pairs = cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_count=2, max_basket_size=100
    )
    # Distributed top-50 first (TakeOrderedAndProject — per-partition
    # heaps, never a global sort), THEN rank over the ≤50 survivors:
    # the partition-less Window touches a bounded table (round 9).
    top = pairs.orderBy(
        F.col("n_baskets").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(50)
    w = Window.orderBy(
        F.col("n_baskets").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .orderBy("rank")
    )


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join without an equi key, via time-bucket
    blocking (operators/relational.bucketed_interval_join): order
    fulfillment windows (orderdate..orderdate+30d) against fixed
    quarterly campaign windows — counts per campaign."""
    from etl_deltalake_spark.operators.relational import (
        bucketed_interval_join,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_id"),
        F.to_timestamp("o_orderdate").alias("w_start"),
        F.to_timestamp(F.date_add("o_orderdate", 30)).alias("w_end"),
    )
    campaigns = spark.createDataFrame(
        [
            (1, "1994-01-01", "1994-04-01"),
            (2, "1994-07-01", "1994-10-01"),
            (3, "1995-01-01", "1995-04-01"),
        ],
        ["r_id", "c_start", "c_end"],
    ).select(
        "r_id",
        F.to_timestamp("c_start").alias("c_start"),
        F.to_timestamp("c_end").alias("c_end"),
    )
    pairs = bucketed_interval_join(
        orders, campaigns, "w_start", "w_end", "c_start", "c_end",
        bucket_secs=30 * 86400,
    )
    return (
        pairs.groupBy("r_id")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("r_id")
    )


def q_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch customer order-count frequencies vs exact counts
    (operators/stats.cms_counts) — deterministic md5 buckets, so the
    sketch itself is cross-engine reproducible."""
    from etl_deltalake_spark.operators.stats import cms_counts

    orders = load_table(spark, "orders", sf_dir)
    return cms_counts(orders, "o_custkey", depth=4, width=64).orderBy("o_custkey")


def q_rollup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance, oracle-verified end-to-end
    (operators/rollups.py): build per-batch partial aggregate state
    from TWO disjoint batch splits of lineitem, MERGE the states
    (never rescanning either batch), derive read-time metrics — and
    the DuckDB oracle computes the same metrics with a ONE-SHOT
    aggregate over the whole table. A merge that isn't exactly
    additive (float drift, lost nulls, min/max mixups) hash-fails.
    DECIMAL sums keep maintained-state == recompute bitwise."""
    from etl_deltalake_spark.operators.rollups import (
        merge_rollup_states,
        rollup_result,
        rollup_state,
    )

    li = load_table(spark, "lineitem", sf_dir)
    group = ["l_returnflag", "l_linestatus"]
    b1 = li.filter(F.col("l_orderkey") % 2 == 0)
    b2 = li.filter(F.col("l_orderkey") % 2 == 1)
    state = merge_rollup_states(
        rollup_state(b1, group, "l_quantity"),
        rollup_state(b2, group, "l_quantity"),
    )
    return rollup_result(state).orderBy(*group)


_MEDIA_PALETTE = bytes(
    [10, 20, 30, 200, 100, 0, 0, 255, 128, 255, 255, 255]
)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-pixel decode, cross-engine verified: synthesize one
    deterministic payload per document cycling ALL NINE codec paths
    by doc_id % 9 — PNG 8-bit gray, PNG 8-bit RGB, PNG 2-bit-packed
    palette written ADAM7-INTERLACED (PLTE expansion + sub-byte
    unpack + 7-pass scatter all on the graded path), PNG 16-bit gray
    (big-endian byte pairs), PNG 2-bit palette WITH a tRNS table →
    RGBA expansion (round 6), and (round 9) a REAL baseline JPEG —
    Huffman entropy decode + dequant + IDCT through operators/jpeg.py
    under the DC-exactness contract: block-constant grayscale with
    the flat all-8s quant table decodes bit-exactly, so the oracle
    re-derives JPEG pixels in closed form too — plus a COLOR 4:2:0
    JPEG mode: MCU-constant YCbCr planes (fed via ycbcr_input)
    survive DCT/quant/box-average exactly, so only the shared
    closed-form YCbCr→RGB rounding remains, replayed in SQL (chroma
    values are multiples of 4, which provably never land on an
    exact .5 rounding boundary — enumerated in test_jpeg.py) — and
    (round 10) a PROGRESSIVE (SOF2) grayscale JPEG: the multi-scan
    spectral-selection + successive-approximation decode path under
    the same block-constant DC-exactness closed form — and an
    INTERLACED GIF (mode 8, operators/gif.py): LZW decompression +
    4-pass row reassembly over the shared 4-entry palette, graded by
    the same palette channel-sum closed form as PNG mode 2.
    Pixel formula (PNG modes): sample k = (doc_id*31 + k) % 256 (% 4
    palette indices, % 65536 16-bit values); scanline filters cycle
    0-4 so every unfilter branch runs. JPEG gray mode: 8×8 block b
    holds the constant (doc_id*31 + b) % 256 over a (1+d%3)×(1+d%2)
    block grid. JPEG color mode: 16×16 tile t holds constant
    Y=(d·31+5t)%256, Cb=4·((d·17+7t)%60)+4, Cr=4·((d·13+11t)%60)+4. Decode via multimodal.decode_image's magic-byte sniffing
    (``89 PNG`` vs ``FF D8``); the DuckDB oracle recomputes
    dimensions + exact pixel-byte mean from the closed forms — a
    decoder that mis-parses any container feature, mis-inverts any
    filter, or mis-decodes any Huffman/DCT step hash-mismatches
    immediately. Both stages are Arrow-batched mapInPandas, zero
    shuffles."""
    import pandas as pd

    from etl_deltalake_spark.operators.gif import encode_gif
    from etl_deltalake_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from etl_deltalake_spark.operators.multimodal import decode_image
    from etl_deltalake_spark.operators.png import encode_png

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_png(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                # width modulus 7 is COPRIME with the mode
                # selector's 9? No — they would alias (round-8
                # ADVICE-r7 rule). PNG/GIF dims therefore derive from
                # d // 9, which is independent of d % 9: every path
                # still sees every width/height combination.
                w = 3 + (d // 9) % 7
                h = 2 + (d // 9) % 4
                mode = d % 9
                if mode == 0:
                    px = bytes((d * 31 + k) % 256 for k in range(w * h))
                    blob = encode_png(px, w, h, 0, "cycle")
                elif mode == 1:
                    px = bytes(
                        (d * 31 + k) % 256 for k in range(w * h * 3)
                    )
                    blob = encode_png(px, w, h, 2, "cycle")
                elif mode == 2:
                    idx = bytes((d * 31 + k) % 4 for k in range(w * h))
                    blob = encode_png(
                        idx, w, h, 3, "cycle",
                        bit_depth=2, palette=_MEDIA_PALETTE,
                        interlace=True,
                    )
                elif mode == 3:
                    px = b"".join(
                        ((d * 31 + k) % 65536).to_bytes(2, "big")
                        for k in range(w * h)
                    )
                    blob = encode_png(px, w, h, 0, "cycle", bit_depth=16)
                elif mode == 4:  # palette + tRNS → RGBA expansion
                    idx = bytes((d * 31 + k) % 4 for k in range(w * h))
                    blob = encode_png(
                        idx, w, h, 3, "cycle",
                        bit_depth=2, palette=_MEDIA_PALETTE,
                        trns=bytes([0, 255, 128]),
                    )
                elif mode in (5, 7):  # gray JPEG, DC-exactness
                    # contract — mode 5 baseline, mode 7 PROGRESSIVE
                    # (round 10): the same block-constant closed form
                    # survives any scan script, so the oracle stays
                    # identical while the SOF2 multi-scan decode path
                    # (spectral selection + successive approximation)
                    # is driver-graded.
                    wb, hb = 1 + d % 3, 1 + d % 2
                    w, h = 8 * wb, 8 * hb
                    px = bytes(
                        (d * 31 + ((yy // 8) * wb + (xx // 8))) % 256
                        for yy in range(h)
                        for xx in range(w)
                    )
                    if mode == 5:
                        blob = encode_jpeg(px, w, h, 1)
                    else:
                        blob = encode_jpeg_progressive(px, w, h, 1)
                elif mode == 6:  # color 4:2:0 JPEG, MCU-constant
                    tx, ty = 1 + d % 2, 1 + (d % 4) // 2
                    w, h = 16 * tx, 16 * ty
                    buf = bytearray()
                    for yy in range(h):
                        for xx in range(w):
                            t = (yy // 16) * tx + (xx // 16)
                            buf += bytes(
                                (
                                    (d * 31 + 5 * t) % 256,
                                    4 * ((d * 17 + 7 * t) % 60) + 4,
                                    4 * ((d * 13 + 11 * t) % 60) + 4,
                                )
                            )
                    blob = encode_jpeg(
                        bytes(buf), w, h, 3,
                        subsample="420", ycbcr_input=True,
                    )
                else:  # mode 8 (round 10): INTERLACED GIF over the
                    # shared 4-entry palette — LZW decode + 4-pass
                    # row reassembly on the graded path; same
                    # closed-form palette sums as PNG mode 2
                    idx = bytes((d * 31 + k) % 4 for k in range(w * h))
                    pal = [
                        tuple(_MEDIA_PALETTE[3 * i:3 * i + 3])
                        for i in range(4)
                    ]
                    blob = encode_gif(idx, w, h, pal, interlace=True)
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_png, schema="doc_id long, payload binary")
    dec = decode_image(media, "doc_id", "payload")
    return dec.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.round(F.col("pix_sum").cast("double") / F.col("n_pix"), 6).alias(
            "mean_pixel"
        ),
    ).orderBy("doc_id")


def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-text PII scrub + per-category audit counts over documents
    (operators/text.redact_pii / pii_hits)."""
    from etl_deltalake_spark.operators.pii import pii_hits, redact_pii

    docs = load_table(spark, "documents", sf_dir)
    hits = pii_hits("text")
    return docs.select(
        "doc_id",
        F.md5(redact_pii("text")).alias("redacted_md5"),
        *[c.alias(f"n_{name}") for name, c in hits.items()],
    ).orderBy("doc_id")


def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication report over documents
    (operators/dedup.substring_dup_stats): per doc, the exact
    interval-union fraction of words covered by cross-doc repeated
    5-gram spans — the span-level dedup tier (doc-exact and near-dup
    are q_dedup_exact / q_minhash_lsh)."""
    from etl_deltalake_spark.operators.dedup import substring_dup_stats

    docs = load_table(spark, "documents", sf_dir)
    return substring_dup_stats(docs, "doc_id", "text", k=5).orderBy("doc")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark through the REAL readStream path
    (streaming/pipeline.dedup_stream): the source directory holds TWO
    copies of the events file (simulated at-least-once redelivery),
    the stream dedups on event_id within a watermark spanning the
    fixture, and the drained sink is aggregated per event_type. The
    DuckDB oracle doubles the table with UNION ALL and dedups it
    back — a dedup that leaks a duplicate or drops a unique row
    breaks the count AND the decimal sum."""
    import shutil
    import tempfile
    import uuid

    from etl_deltalake_spark.streaming import pipeline as P

    src = tempfile.mkdtemp(prefix="sgraft_dedup_src_")
    for copy in ("events_a.parquet", "events_b.parquet"):
        shutil.copyfile(f"{sf_dir}/events.parquet", f"{src}/{copy}")
    stream = P.read_events_stream(
        spark, src, sf_dir, glob="events_*.parquet"
    )
    deduped = P.dedup_stream(stream, watermark="3650 days").select(
        "event_id", "event_type", "value"
    )
    ckpt = tempfile.mkdtemp(prefix="sgraft_dedup_ckpt_")
    name = f"d_{uuid.uuid4().hex[:12]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM WAV decode, cross-engine verified: synthesize one
    deterministic clip per document (mono for even doc_id, stereo
    for odd; sample k of doc d derives from the integer formula
    s = ((d*37 + k*101) % 65536) - 32768; frame count varying per
    doc). Codec-path schedule, first match wins: doc_id % 11 == 5
    clips are MICROSOFT ADPCM (audio_format 2, round 8) at 12
    samples per block with the per-block coefficient pair on the
    closed-form schedule (d + block + channel) % 7 — all seven
    canonical predictors exercised; doc_id % 7 == 3 clips are
    IMA/DVI ADPCM (audio_format 17, round 8) at 9 samples per block
    so nearly every clip ends in a partial final block (fact-chunk
    truncation live); doc_id % 3 == 2 clips are IEEE-FLOAT32 PCM
    (round 6) with sample s/32768 — dyadic rationals float32 holds
    exactly, so sums/peaks stay bitwise-comparable across engines;
    the rest are integer 16-bit. Decode with the pure-stdlib codec
    (operators/wav.py via multimodal.decode_audio) and emit format
    fields + exact amplitude stats. The DuckDB oracle recomputes the
    same statistics from the closed-form sample formula — for both
    ADPCM families it runs the ENTIRE encoder+decoder quantize/step
    state machine as recursive CTEs over the public IMA/MS tables,
    so a codec that mis-walks blocks, mis-interleaves stereo,
    mis-clamps the predictor or delta, or mis-truncates the padded
    tail hash-mismatches immediately. Both stages are Arrow-batched
    mapInPandas, zero shuffles."""
    import pandas as pd

    from etl_deltalake_spark.operators.multimodal import decode_audio
    from etl_deltalake_spark.operators.wav import (
        encode_ima_adpcm,
        encode_ms_adpcm,
        encode_wav,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_wav(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                channels = 1 + d % 2
                n_frames = 40 + d % 50
                ints = [
                    ((d * 37 + k * 101) % 65536) - 32768
                    for k in range(n_frames * channels)
                ]
                if d % 11 == 5:
                    payloads.append(
                        encode_ms_adpcm(
                            ints, channels, 8000, samples_per_block=12,
                            predictor=lambda b, ch, d=d: (d + b + ch) % 7,
                        )
                    )
                elif d % 7 == 3:
                    payloads.append(
                        encode_ima_adpcm(
                            ints, channels, 8000, samples_per_block=9
                        )
                    )
                elif d % 3 == 2:
                    payloads.append(
                        encode_wav(
                            [s / 32768.0 for s in ints], channels, 8000,
                            bit_depth=32, sample_format="float",
                        )
                    )
                else:
                    payloads.append(encode_wav(ints, channels, 8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_wav, schema="doc_id long, payload binary")
    dec = decode_audio(media, "doc_id", "payload")
    return dec.select(
        "doc_id",
        "channels",
        "sample_rate",
        "n_frames",
        "duration_ms",
        "samp_sum",
        "peak_abs",
        F.round(
            F.col("samp_sum").cast("double")
            / (F.col("n_frames") * F.col("channels")),
            6,
        ).alias("mean_sample"),
    ).orderBy("doc_id")


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed ANN top-10 for vec_id=0: coarse-probe the 2
    nearest of the subsampled centroids, then ADC-score only the
    survivors' compressed codes (operators/similarity.ivfpq_topk) —
    the production shape where partition pruning and code-only
    scoring stack. Fully deterministic, so the oracle re-derives
    probe + assignment + training + encode + scoring bitwise."""
    from etl_deltalake_spark.operators.similarity import ivfpq_topk, pq_train

    emb = load_table(spark, "embeddings", sf_dir)
    books = _pq_books(spark, sf_dir)
    centroids = _ivf_centroids(spark, sf_dir)
    return ivfpq_topk(
        emb,
        "vec_id",
        "embedding",
        _query_vec(spark, sf_dir),
        centroids,
        books,
        k=10,
        nprobe=2,
    ).orderBy("rank")


def q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicated-span REMOVAL over documents
    (operators/dedup.strip_duplicate_spans): rebuild each doc's
    normalized text with repeated 5-gram spans stripped, canonical
    (min-doc) copies kept. The rebuilt text is md5'd so the driver
    compares exact string equality without hauling documents."""
    from etl_deltalake_spark.operators.dedup import strip_duplicate_spans

    docs = load_table(spark, "documents", sf_dir)
    out = strip_duplicate_spans(docs, "doc_id", "text", k=5)
    return out.select(
        "doc",
        "n_words",
        "n_kept",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc")


def _drain_stream_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """availableNow-drain a streaming DataFrame into a uniquely-named
    memory sink and return the sink table."""
    import tempfile
    import uuid

    name = f"s_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="sgraft_stream_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows through the REAL readStream path
    (streaming/pipeline.sliding_counts) — the streaming twin of the
    batch sliding query, sharing its oracle: stream and batch must
    agree exactly. Watermark spans the fixture so no window is
    dropped as late across micro-batches."""
    from etl_deltalake_spark.streaming import pipeline as P

    stream = P.read_events_stream(spark, sf_dir, sf_dir)
    out = _drain_stream_to_memory(
        P.sliding_counts(stream, watermark="3650 days"), "complete"
    )
    return out.orderBy("window_start", "event_type")


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user through the REAL
    readStream path (streaming/pipeline.session_counts), sharing the
    batch q_session_window oracle — the merging session-state
    operator verified stream-vs-SQL."""
    from etl_deltalake_spark.streaming import pipeline as P

    stream = P.read_events_stream(spark, sf_dir, sf_dir)
    out = _drain_stream_to_memory(
        P.session_counts(stream, watermark="3650 days"), "complete"
    )
    return out.orderBy("user_id", "session_start")


def q_quota_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase quota sampling over documents
    (operators/curation.quota_sample_two_phase): per-partition
    Arrow-batched pre-cap, then the exact window — shares
    q_quota_sample's oracle because the pre-cap provably never drops
    a global winner; cross-engine equality proves the composed path,
    not just the property test."""
    from etl_deltalake_spark.operators.curation import quota_sample_two_phase

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        quota_sample_two_phase(docs, "source", "doc_id", 40)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER join through the REAL readStream path
    (streaming/pipeline.click_purchase_join): purchases attributed
    to a same-user click within 30 minutes, both sides watermarked,
    drained append-mode. The DuckDB oracle is the equivalent batch
    self-join — the streaming join must emit exactly the relational
    answer."""
    from etl_deltalake_spark.streaming import pipeline as P

    stream = P.read_events_stream(spark, sf_dir, sf_dir)
    out = _drain_stream_to_memory(
        P.click_purchase_join(stream, watermark="3650 days"), "append"
    )
    return out.orderBy("click_id", "purchase_id")


def q_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF+PQ ANN top-10 for vec_id=0: codes quantize
    v − centroid(v), scoring unions one ADC table per probed cluster
    (operators/similarity.ivfpq_residual_topk) — the Jégou-style
    refinement, trained/encoded/scored deterministically so the
    oracle re-derives every stage bitwise."""
    from etl_deltalake_spark.operators.similarity import ivfpq_residual_topk

    emb = load_table(spark, "embeddings", sf_dir)
    return ivfpq_residual_topk(
        emb,
        "vec_id",
        "embedding",
        _query_vec(spark, sf_dir),
        _ivf_centroids(spark, sf_dir),
        m=4,
        ksub=8,
        iterations=2,
        k=10,
        nprobe=2,
    ).orderBy("rank")


# --------------------------------------------------- TPC-H classics
# The fixture is TPC-H-shaped, so the three canonical multi-join
# analytics queries run verbatim (adapted to the fixture's columns:
# o_orderpriority stands in for o_shippriority in Q3's carry-through).
# Decimal-first arithmetic keeps the revenue sums bitwise-comparable.

def _revenue():
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped BUILDING-segment
    orders by pending revenue — customer⋈orders⋈lineitem with
    scan-side date predicates on both fact tables."""
    cutoff = "1998-03-15"
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue from orders where
    the supplier and customer share an ASIA nation, one order-date
    year — the 6-table join with both dims broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): customers ranked by revenue lost
    to returns in one quarter — top 20."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance through the REAL streaming
    engine (streaming/pipeline.rollup_maintenance_stream): the events
    table is split into THREE source files, maxFilesPerTrigger=1
    forces three micro-batches, each merging its partial aggregate
    state into the stored state — and the final state's read-time
    metrics must equal DuckDB's one-shot aggregate over the whole
    table bitwise. Grades the mergeable-state contract under real
    epoch sequencing, not just the batch-split property test."""
    import tempfile

    from etl_deltalake_spark.operators.rollups import rollup_result
    from etl_deltalake_spark.streaming import pipeline as P

    src = tempfile.mkdtemp(prefix="sgraft_rollup_src_")
    ev = load_table(spark, "events", sf_dir)
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state_dir = tempfile.mkdtemp(prefix="sgraft_rollup_state_")
    ckpt = tempfile.mkdtemp(prefix="sgraft_rollup_ckpt_")
    # the rewritten splits carry load_table's normalized TIMESTAMP ts,
    # so a plain schema'd readStream suffices (no nanos handling)
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/part0").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    final = P.rollup_maintenance_stream(
        stream, ["event_type"], "value", state_dir, ckpt
    )
    return rollup_result(spark.read.parquet(final)).orderBy("event_type")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the MinHash+LSH near-duplicate graph
    (operators/graph.pagerank): symmetrized near-dup pairs as edges,
    5 damped power-iteration rounds, decimal-quantized contribution
    sums so the DuckDB oracle (5 unrolled rounds over the same pair
    SQL) matches bitwise — the second iterative-graph operator next
    to label propagation."""
    from etl_deltalake_spark.operators.dedup import minhash_near_dup_pairs
    from etl_deltalake_spark.operators.graph import pagerank

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, num_perm=16, bands=4, threshold=0.5
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return pagerank(edges, iterations=5).orderBy("doc")


def q_neg_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling over documents
    (operators/curation.negative_samples): 4 hash-drawn negatives
    per anchor, scan-side only — the oracle re-derives every draw
    from the same md5 arithmetic."""
    from etl_deltalake_spark.operators.curation import negative_samples

    docs = load_table(spark, "documents", sf_dir)
    return negative_samples(docs, "doc_id", k=4).orderBy("doc_id", "j")


def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier stats per returnflag over extended price
    (operators/stats.mad_outliers): median, median absolute
    deviation, and the 3-MAD outlier count — the robust z-score
    alternative for data profiling."""
    from etl_deltalake_spark.operators.stats import mad_outliers

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    return mad_outliers(li, ["l_returnflag"], "price", threshold=3.0).orderBy(
        "l_returnflag"
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization of the event stream
    (operators/behavior.session_stats): 30-minute inactivity gap,
    event_id tiebreak for a total order, per-session event counts and
    durations. One user-key shuffle; the (user, session) rollup
    reuses the window's partitioning."""
    from etl_deltalake_spark.operators.behavior import session_stats

    ev = load_table(spark, "events", sf_dir)
    return session_stats(
        ev, "user_id", "ts", gap_secs=1800, tiebreak_cols=["event_id"]
    ).orderBy("user_id", "session_n")


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reads over the SCD2 dimension history
    (operators/scd.scd2_snapshot): rebuild q_scd2's two-batch merge,
    then reconstruct the dimension AS OF 2024-01-15 (pre-merge state)
    and AS OF 2024-02-15 (post-merge state) — the portable analogue
    of Delta time travel (reference main.py:465-470 is Type-1 and
    keeps no history). Scan-side validity predicates, no shuffle
    beyond the SCD2 build itself."""
    from etl_deltalake_spark.operators.scd import (
        scd2_init,
        scd2_merge,
        scd2_snapshot,
    )

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    b1 = cust.filter(F.col("c_custkey") % 11 != 0).withColumn(
        "eff", F.lit("2024-01-01")
    )
    t1 = scd2_init(b1, ["c_custkey"], ["c_mktsegment"], "eff")
    b2 = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).withColumn("eff", F.lit("2024-02-01"))
    t2 = scd2_merge(t1, b2, ["c_custkey"], ["c_mktsegment"], "eff")
    snaps = [
        scd2_snapshot(t2, d).withColumn("snap", F.lit(d))
        for d in ("2024-01-15", "2024-02-15")
    ]
    return snaps[0].unionByName(snaps[1]).orderBy("snap", "c_custkey")


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-term mining over the corpus
    (operators/stats.heavy_hitters): every lowercased word with
    >= 1/100 of total word mass, via per-partition Misra-Gries
    candidates + broadcast exact recount — bounded memory at
    unbounded vocabulary, exact integer threshold."""
    from etl_deltalake_spark.operators.stats import heavy_hitters

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    from etl_deltalake_spark.operators.text import word_tokens

    words = docs.select(
        F.explode(word_tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    return heavy_hitters(words, "word", num=1, denom=100).orderBy("word")


def q_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive cross-engine table fingerprint
    (operators/reconcile.table_checksum) over the customer dimension:
    (n_rows, Σ 48-bit md5 row signatures) as exact decimal — the
    DuckDB oracle recomputes the identical fingerprint from its own
    md5, so any cell difference or null-rendering divergence
    hash-fails. Map-side partial sums only; no keys shuffle."""
    from etl_deltalake_spark.operators.reconcile import table_checksum

    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    cust = load_table(spark, "customer", sf_dir).select(*cols)
    return table_checksum(cust, cols)


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single-table predicate
    aggregate — every filter pushes into the parquet scan (year of
    shipdate, discount band, quantity cap), the sum is one map-side
    partial. The canonical 'is your scan pruned?' plan."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue")
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join
    so zero-order customers count at c_count=0, then the distribution
    of distribution — two key shuffles, second one on the tiny
    (c_count) domain."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one-month lineitem slice joined
    to the broadcast part dim; promo revenue share via conditional
    decimal sums, final ratio rounded for cross-engine bitwise
    match."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(38,4)")
                )
            ).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    the max-revenue supplier(s) via a 1-row max aggregate broadcast
    back over the revenue table (round 9 — replaces a rank over a
    partition-less Window, which funneled the supplier-sized table
    through one task; the max+filter form is all map-side and
    mirrors the oracle's scalar subquery). Ties all surface, as the
    spec requires."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    supp = load_table(spark, "supplier", sf_dir)
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    return (
        supp.join(top, supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total
    quantity exceeds 250, carried through customer⋈orders⋈lineitem —
    the having-subquery shape expressed as a semi-join against the
    aggregated order list (shuffle carries (orderkey, qty) pairs
    only)."""
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q")
        )
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    j = (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return (
        j.groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(
            F.desc("o_totalprice"), "o_orderdate", "o_orderkey"
        )
        .limit(100)
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag winsorization of extended price into the
    [p05, p95] band (operators/stats.winsorize): bounds from one
    groupBy (broadcast back), clamp map-side — rows never shuffle.
    Clamped values are bit-exact: either the untouched input double
    or the rounded bound, in both engines."""
    from etl_deltalake_spark.operators.stats import winsorize

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    return winsorize(
        li, ["l_returnflag"], "price", lo=0.05, hi=0.95
    ).orderBy("l_orderkey", "l_linenumber")


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction, graded end-to-end
    (operators/bloom.py): build a deterministic md5 Bloom filter
    over high-balance customers (dimension side), test every order
    scan-side, and report per-status how many orders the filter
    passes vs the exact semi-join count. No false negatives is the
    invariant (n_bloom >= n_exact per status, equality when no
    false positives); the DuckDB oracle rebuilds the identical
    filter bit-for-bit, so any hash/layout drift hash-fails."""
    from etl_deltalake_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 9900
    )
    orders = load_table(spark, "orders", sf_dir)
    words = bloom_build(cust, "c_custkey", n_words=256, n_hashes=4)
    probed = orders.withColumn(
        "_hit", bloom_might_contain(F.col("o_custkey"), words, n_hashes=4)
    )
    a = probed.groupBy("o_orderstatus").agg(
        F.sum(F.col("_hit").cast("bigint")).alias("n_bloom"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    exact = orders.join(
        F.broadcast(
            cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
        ),
        "o_custkey",
        "left_semi",
    )
    b = exact.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        a.join(b, "o_orderstatus", "left")
        .na.fill(0, ["n_exact"])
        .orderBy("o_orderstatus")
    )


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language stratified train/val/test assignment over
    documents (operators/curation.stratified_split, weights 8/1/1):
    every language stratum splits floor-exactly 80/10/10 — the
    frozen-eval-set complement of q_hash_split's growth-stable
    fractions. One strata-key window shuffle."""
    from etl_deltalake_spark.operators.curation import stratified_split

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return stratified_split(
        docs, ["lang"], "doc_id", {"train": 8, "val": 1, "test": 1}
    ).orderBy("doc_id")


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic per event type
    (operators/stats.ab_welch): users hash-split into control/treat
    by id parity, compared on event value — decimal sufficient
    statistics in one conditional aggregation, the t arithmetic
    mirrored by the oracle expression-for-expression."""
    from etl_deltalake_spark.operators.stats import ab_welch

    ev = load_table(spark, "events", sf_dir).withColumn(
        "variant",
        F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, F.lit("ctrl"))
        .otherwise(F.lit("treat")),
    )
    return ab_welch(
        ev, ["event_type"], "variant", "value", a="ctrl", b="treat"
    ).orderBy("event_type")


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-key skew diagnostic for orders.o_custkey
    (operators/partitioning.key_skew_report): the distribution of
    per-key counts reduced to one row — the pre-shuffle profile that
    decides between plain, salted, and AQE-skew joins."""
    from etl_deltalake_spark.operators.partitioning import key_skew_report

    orders = load_table(spark, "orders", sf_dir)
    return key_skew_report(orders, ["o_custkey"])


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over per-user daily buckets
    (operators/timeseries.resample_interp) — the time-weighted
    sibling of q_resample_locf; observed values pass through bitwise,
    interpolated values round to 6."""
    from etl_deltalake_spark.operators.timeseries import resample_interp

    ev = load_table(spark, "events", sf_dir)
    return (
        resample_interp(
            ev, "user_id", "ts", "value", step="1 day", tiebreak_col="event_id"
        )
        .withColumnRenamed("key", "user_id")
        .orderBy("user_id", "bucket")
    )


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the MinHash+LSH near-dup graph
    (operators/graph.triangle_count): low→high edge orientation
    counts each triangle once and bounds the wedge join by the low
    vertex's out-degree — template families in the corpus surface as
    triangle-dense neighborhoods."""
    from etl_deltalake_spark.operators.dedup import minhash_near_dup_pairs
    from etl_deltalake_spark.operators.graph import triangle_count

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    pairs = minhash_near_dup_pairs(
        docs, "doc_id", "text", k=3, num_perm=16, bands=4, threshold=0.5
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return triangle_count(edges).orderBy("node")


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge per customer over the order stream
    (operators/reconcile.golden_record): attributes nulled on
    deterministic patterns (status on %3 orders, priority on %5)
    must survive from the latest NON-NULL carrier, not the latest
    row — one groupBy, no window, no join."""
    from etl_deltalake_spark.operators.reconcile import golden_record

    orders = load_table(spark, "orders", sf_dir)
    src = orders.select(
        "o_custkey",
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 != 0, F.col("o_orderstatus")
        ).alias("status"),
        F.when(
            F.col("o_orderkey") % 5 != 0, F.col("o_orderpriority")
        ).alias("priority"),
    )
    return golden_record(
        src, ["o_custkey"], "o_orderkey", ["status", "priority"]
    ).orderBy("o_custkey")


def q_corpus_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the even- and odd-numbered document
    sources (operators/curation.corpus_divergence): top-15 terms by
    add-one-smoothed KL(P‖Q) contribution — the domain-shift
    detector. One conditional-count pass; corpus totals ride a
    single-row broadcast cross join."""
    from etl_deltalake_spark.operators.curation import corpus_divergence

    docs = load_table(spark, "documents", sf_dir)
    side = F.substring(F.col("source"), 4, 10).cast("int") % 2 == 0
    return corpus_divergence(docs, side, "text", top_k=15)


def q_incr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup of a new crawl batch against the
    historical fingerprint store (operators/dedup.incremental_dedup):
    even-id documents stand in for history (only their 32-char
    fingerprints participate), odd-id documents are the new batch —
    survivors are first-in-batch AND unseen-in-history. Returns
    (doc_id, fp, n_chars) per survivor."""
    from etl_deltalake_spark.operators.dedup import incremental_dedup
    from etl_deltalake_spark.operators.text import normalize_text

    docs = load_table(spark, "documents", sf_dir)
    hist = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5(normalize_text("text")).alias("fp")
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "n_chars"
    )
    return (
        incremental_dedup(batch, hist, "doc_id", "text")
        .select("doc_id", "fp", "n_chars")
        .orderBy("doc_id")
    )


def q_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal (operators/graph.ancestor_paths)
    over a synthetic decimal tree on customers (parent = custkey/10):
    every (node, ancestor, depth) path — graded against DuckDB's
    native WITH RECURSIVE, so Spark's iterative frontier expansion
    must match a real recursive-CTE engine row for row."""
    from etl_deltalake_spark.operators.graph import ancestor_paths

    cust = load_table(spark, "customer", sf_dir)
    edges = cust.filter(F.col("c_custkey") >= 10).select(
        F.col("c_custkey").alias("child"),
        F.floor(F.col("c_custkey") / 10).cast("bigint").alias("parent"),
    )
    return ancestor_paths(edges, "child", "parent").orderBy(
        "node", "depth"
    )


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-maintained top-k: the SAME mergeable per-key state
    as q_stream_rollup, keyed at user granularity across three
    forced micro-batch epochs, then a read-time top-10 heaviest
    users (n_rows DESC, user_id tiebreak) — the continuously-
    maintained leaderboard pattern: the stream updates O(#keys)
    state, the top-k is a query over state, never over history.
    Oracle = one-shot SQL top-k over the whole table."""
    import tempfile

    from etl_deltalake_spark.operators.rollups import rollup_result
    from etl_deltalake_spark.streaming import pipeline as P

    src = tempfile.mkdtemp(prefix="sgraft_topk_src_")
    ev = load_table(spark, "events", sf_dir)
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state_dir = tempfile.mkdtemp(prefix="sgraft_topk_state_")
    ckpt = tempfile.mkdtemp(prefix="sgraft_topk_ckpt_")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/part0").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    final = P.rollup_maintenance_stream(
        stream, ["user_id"], "value", state_dir, ckpt
    )
    return (
        rollup_result(spark.read.parquet(final))
        .select("user_id", "n_rows", "total")
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(10)
    )


def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (operators/stats.
    deterministic_mode): the most common order priority per customer
    segment-nation... kept simple: per o_orderstatus, the most
    frequent o_orderpriority with total tie-break — native mode()'s
    implementation-defined ties are exactly what this replaces."""
    from etl_deltalake_spark.operators.stats import deterministic_mode

    orders = load_table(spark, "orders", sf_dir)
    return deterministic_mode(
        orders, ["o_orderstatus"], "o_orderpriority"
    ).orderBy("o_orderstatus")


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge with deletes (operators/reconcile.apply_cdc): base
    snapshot = even-key orders; the change log deletes %4 keys,
    updates %6 keys (status → 'X'), inserts the odd keys, with two
    sequenced changes for %12 keys (delete at seq 1, re-insert at
    seq 2 — log-replay nets to the re-insert). Oracle recomputes the
    net snapshot from the same rules."""
    from etl_deltalake_spark.operators.reconcile import apply_cdc

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    deletes = base.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.lit("D").alias("op"), F.lit(1).alias("seq"),
    )
    updates = base.filter(
        (F.col("o_orderkey") % 6 == 0) & (F.col("o_orderkey") % 4 != 0)
    ).select(
        "o_orderkey", "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    reinserts = base.filter(F.col("o_orderkey") % 12 == 0).select(
        "o_orderkey", "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        F.lit("I").alias("op"), F.lit(2).alias("seq"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts).unionByName(
        reinserts
    )
    return apply_cdc(
        base, changes, ["o_orderkey"], op_col="op", seq_col="seq"
    ).orderBy("o_orderkey")


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of extended price per returnflag
    (operators/stats.benford_profile) — digit extraction through an
    exact decimal string render, no float log/pow boundaries."""
    from etl_deltalake_spark.operators.stats import benford_profile

    li = load_table(spark, "lineitem", sf_dir)
    return benford_profile(
        li, ["l_returnflag"], "l_extendedprice"
    ).orderBy("l_returnflag", "digit")


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation and higher-order-function breadth (SURVEY
    §2.8 scalar library, array half): per-order sorted distinct
    part/supplier key sets, then intersect/union/except sizes, an
    aggregate fold sum, a filter count, and an exists test — every
    result a scalar, so engine-specific array ORDER semantics never
    reach the comparison."""
    li = load_table(spark, "lineitem", sf_dir)
    grp = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts"),
        F.array_sort(F.collect_set("l_suppkey")).alias("supps"),
    )
    return grp.select(
        "l_orderkey",
        F.size(F.array_intersect("parts", "supps"))
        .cast("bigint")
        .alias("n_common"),
        F.size(F.array_union("parts", "supps")).cast("bigint").alias("n_all"),
        F.size(F.array_except("parts", "supps"))
        .cast("bigint")
        .alias("n_only_parts"),
        F.element_at("parts", 1).alias("min_part"),
        F.size(F.filter("parts", lambda x: x % 2 == 0))
        .cast("bigint")
        .alias("n_even_parts"),
        F.aggregate(
            "parts", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("sum_parts"),
        F.exists("supps", lambda x: x < 100).alias("any_small_supp"),
    ).orderBy("l_orderkey")


# ---------------------------------------------------------------- round 5

_ANN_INDEX_CACHE: dict[str, str] = {}


def _ivfpq_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) and return the persisted IVF+PQ index for this
    sf_dir — the production layout: (vec_id, codes) parquet
    partitioned by cluster_id (similarity.build_ivfpq_index). The
    build is deterministic (subsampled centroids + seeded PQ train),
    so an index left by an earlier process is byte-compatible and
    reused; the version tag in the path invalidates on layout
    changes."""
    if sf_dir not in _ANN_INDEX_CACHE:
        import os

        from etl_deltalake_spark.operators.similarity import build_ivfpq_index

        sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
        path = f"/tmp/spark_graft_ann/{sfname}/ivfpq_v1_m4_k8"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            emb = load_table(spark, "embeddings", sf_dir)
            build_ivfpq_index(
                emb,
                "vec_id",
                "embedding",
                _ivf_centroids(spark, sf_dir),
                _pq_books(spark, sf_dir),
                path,
            )
        _ANN_INDEX_CACHE[sf_dir] = path
    return _ANN_INDEX_CACHE[sf_dir]


def q_ivfpq_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 over the PERSISTED IVF+PQ index (round 5, VERDICT
    r4 Next #4): query cost is partition pruning (3 probed clusters'
    directories listed, the rest never opened — files_touched
    asserted in tests) plus an ADC literal-table scan over the codes.
    Training/assignment/encode cost lives in the one-time
    ``build_ivfpq_index``; this query never touches a raw vector.
    Result is bit-identical to the from-scratch composition, so the
    oracle re-derives the whole chain."""
    from etl_deltalake_spark.operators.similarity import ivfpq_pretrained_topk

    path = _ivfpq_index_path(spark, sf_dir)
    return ivfpq_pretrained_topk(
        spark,
        path,
        "vec_id",
        _query_vec(spark, sf_dir),
        _ivf_centroids(spark, sf_dir),
        _pq_books(spark, sf_dir),
        k=10,
        nprobe=3,
    ).orderBy("rank")


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both ANN tiers against exact cosine ground truth
    (round 5, VERDICT r4 Next #5) — the recall/cost trade graded as a
    number instead of a docstring claim: IVF+PQ (nprobe=2) recall@10
    and hyperplane-LSH bucket recall@5. All four result sets are
    k-row; the joins are broadcast-sized."""
    from etl_deltalake_spark.operators.similarity import (
        bucketed_ann_topk,
        cosine_topk,
        ivfpq_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qv = _query_vec(spark, sf_dir)
    exact10 = cosine_topk(emb, "vec_id", "embedding", qv, k=10).select("vec_id")
    exact5 = cosine_topk(emb, "vec_id", "embedding", qv, k=5).select("vec_id")
    ivf = ivfpq_topk(
        emb,
        "vec_id",
        "embedding",
        qv,
        _ivf_centroids(spark, sf_dir),
        _pq_books(spark, sf_dir),
        k=10,
        nprobe=2,
    ).select("vec_id")
    lsh = bucketed_ann_topk(
        emb, "vec_id", "embedding", qv, k=5, planes=8
    ).select("vec_id")

    def row(method: str, approx: DataFrame, exact: DataFrame, k: int):
        return approx.join(exact, "vec_id").agg(
            F.lit(method).alias("method"),
            F.lit(k).cast("bigint").alias("k"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / float(k), 6).alias("recall"),
        )

    return row("ivfpq", ivf, exact10, 10).unionByName(
        row("lsh_bucket", lsh, exact5, 5)
    )


_NEARDUP_STORE_CACHE: dict[str, str] = {}


def _neardup_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the persisted MinHash signature/band store for
    the HISTORY slice (doc_id % 3 == 0) — dedup.minhash_store written
    to parquet. Deterministic, so a store left by an earlier process
    is byte-compatible and reused (the ANN-index precedent)."""
    if sf_dir not in _NEARDUP_STORE_CACHE:
        import os

        from etl_deltalake_spark.operators.dedup import minhash_store

        sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
        path = f"/tmp/spark_graft_neardup/{sfname}/store_v1_k3_p16_b4"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            hist = load_table(spark, "documents", sf_dir).filter(
                F.col("doc_id") % 3 == 0
            )
            minhash_store(hist, "doc_id", "text").write.mode(
                "overwrite"
            ).parquet(path)
        _NEARDUP_STORE_CACHE[sf_dir] = path
    return _NEARDUP_STORE_CACHE[sf_dir]


def q_incr_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup dedup of a new batch (doc_id % 3 != 0)
    against the persisted MinHash store of history (doc_id % 3 == 0)
    — round 5, VERDICT r4 Next #6. History text is never re-read:
    the probe joins the batch's bands against stored band hashes and
    verifies with signature-estimated Jaccard
    (operators/dedup.incremental_neardup); within-batch near-dups
    cluster via label propagation and keep the min-id canonical."""
    from etl_deltalake_spark.operators.dedup import incremental_neardup

    store = spark.read.parquet(_neardup_store_path(spark, sf_dir))
    batch = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 3 != 0
    )
    return incremental_neardup(batch, store, "doc_id", "text").orderBy("doc")


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script profiling + dominant-script routing (round 5,
    the multilingual follow-through to the Unicode normalize fix):
    per-document character counts for representative scripts and the
    script_id argmax over all nine (operators/text.script_id). On the
    Latin-only fixture every doc routes to 'Latin' — the REAL
    multilingual grading runs the same expressions over mixed
    zh/ru/ar/el/hi/vi/ko docs in tests/test_multilingual.py; this
    driver row pins the cross-engine expression chain itself."""
    from etl_deltalake_spark.operators.text import script_counts, script_id

    docs = load_table(spark, "documents", sf_dir)
    sc = script_counts("text")
    return docs.select(
        "doc_id",
        sc["Latin"].alias("n_latin"),
        sc["Han"].alias("n_han"),
        sc["Cyrillic"].alias("n_cyrillic"),
        script_id("text").alias("script"),
    ).orderBy("doc_id")


def q_random_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 projection of the 64-d embeddings to
    8 components (operators/similarity.random_projection) — the
    shrink-before-ANN stage. Weights are md5-derived plan literals,
    so the oracle re-derives the identical matrix and every component
    compares bitwise after rounding."""
    from etl_deltalake_spark.operators.similarity import random_projection

    emb = load_table(spark, "embeddings", sf_dir)
    proj = random_projection(emb, "vec_id", "embedding", dims=64, out_dim=8)
    return proj.select(
        "vec_id",
        *[F.element_at("proj", j + 1).alias(f"y{j}") for j in range(8)],
    ).orderBy("vec_id")


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between a nation PAIR in
    either direction, grouped by (supplier nation, customer nation,
    ship year) — the two-aliased-dimension join shape. Both nation
    dims broadcast; the fact shuffles once for the aggregate."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_12")
        & (F.col("cust_nation") == "NATION_10")
    ) | (
        (F.col("supp_nation") == "NATION_10")
        & (F.col("cust_nation") == "NATION_12")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of
    AMERICA-region ECONOMY-part revenue per order year — the
    conditional-aggregate-over-join shape. Share = decimal-exact
    conditional sum / decimal-exact total, divided in double and
    rounded, so both engines agree bitwise."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "ECONOMY"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "AMERICA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(
            F.broadcast(region), F.col("n1_region") == region.r_regionkey
        )
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            F.round(share_num / F.sum(vol).cast("double"), 6).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted to the
    fixture schema (no p_container column — the brand filter alone
    selects the part subset): weekly revenue lost if orders below
    20% of a part's average quantity stopped. The correlated-scalar-
    subquery shape, expressed as a per-part aggregate join; the
    threshold predicate is rewritten DECIMAL-EXACT
    (5·l_quantity·count < sum_qty ⟺ l_quantity < 0.2·avg) so no
    float boundary can diverge between engines."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#1"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(
            _dec("l_quantity") * F.col("n_li").cast("decimal(18,0)") * 5
            < F.col("sum_qty")
        )
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
        )
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to the fixture
    schema (no c_phone — country code derives from c_nationkey % 5,
    and every fixture customer has SOME order, so "never ordered"
    becomes "no orders since 2000-01-01"): well-funded customers gone
    inactive, counted per country code. The NOT-EXISTS anti-join + global-scalar-threshold shape;
    the above-average predicate is rewritten decimal-exact
    (c_acctbal·n_pos > sum_pos ⟺ c_acctbal > avg over positive
    balances) to kill float boundaries."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("sum_pos"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(
            _dec("c_acctbal") * F.col("n_pos").cast("decimal(18,0)")
            > F.col("sum_pos")
        )
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the most-executed
    aggregate shape in analytics: one lineitem scan, a shipdate
    cutoff that pushes into the parquet scan, and a 6-wide grouped
    aggregate over the tiny (returnflag, linestatus) domain so the
    shuffle carries 6 partial rows per task. All money math is
    decimal-exact; the three-factor charge product is re-scaled to
    DECIMAL(18,4) between factors so neither engine hits the
    38-digit precision ceiling (both sums stay exact)."""
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = (_dec("l_extendedprice") * (one - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    charge = disc_price * (one + _dec("l_tax"))
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / cnt, 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / cnt, 6
            ).alias("avg_price"),
            F.round(
                F.sum(_dec("l_discount")).cast("double") / cnt, 6
            ).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted to the fixture
    schema (no l_commitdate/l_receiptdate — "late" becomes
    l_shipdate > o_orderdate + 60 days): one quarter of orders,
    counted per priority, where EXISTS a late lineitem. The
    correlated-EXISTS shape compiles to a LEFT SEMI join whose
    condition spans both tables (key equality + the date
    inequality), so only the quarter's orders shuffle and each
    order emits at most once regardless of lineitem fan-out."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority split), adapted to the
    fixture schema (no l_shipmode/l_receiptdate — l_returnflag
    stands in as the mode axis and "late receipt" becomes
    l_shipdate > o_orderdate + 30 days): for one shipdate year,
    per flag, how many late lineitems belonged to critical-priority
    orders vs not. The two-way conditional count is a single
    grouped aggregate (no pivot); the year predicate pushes into
    the lineitem scan before the join."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted to the fixture schema
    (no p_container/l_shipmode/l_shipinstruct — each disjunct keeps
    the brand equality plus size/quantity bands): revenue over an
    OR-of-ANDs predicate that references BOTH join sides, the
    canonical pushdown stressor — per-branch part conjuncts cannot
    be split out of the disjunction, so the plan must evaluate the
    whole predicate post-join while still broadcasting the dim. One
    output row (exact decimal sum)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    pred = (
        ((brand == "Brand#1") & size.between(1, 10) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(1, 20) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(1, 30) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(_revenue().alias("revenue"))
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to the
    fixture schema (no l_receiptdate/l_commitdate — "late" becomes
    l_returnflag = 'R'; the single-nation filter widens to one
    region so the query is non-empty at every scale factor): for
    finalized orders, suppliers in EUROPE whose lineitem was late
    while EVERY other supplier on the order delivered clean — the
    multi-correlated EXISTS / NOT-EXISTS shape.

    Spark-first decorrelation: both correlated subqueries collapse
    into ONE per-order aggregate — n_supp (EXISTS another supplier ⟺
    n_supp ≥ 2) and n_late_supp (NOT EXISTS another late supplier,
    given l1 is late ⟺ n_late_supp = 1). The distinct counts are
    computed as a TWO-LEVEL distinct-free aggregate — group by
    (orderkey, suppkey) with a max(late) flag, then count/sum per
    order — so the plan is two partial-aggregated shuffles on the
    same key, never the 2×-Expand a double countDistinct plans. One
    extra groupBy on the already-shuffled join key instead of two
    lineitem self-joins; the DuckDB oracle runs the canonical
    EXISTS/NOT-EXISTS formulation so the rewrite is cross-checked,
    not assumed."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    late = F.col("l_returnflag") == "R"
    # n_late carries the LINEITEM-row multiplicity (canonical numwait
    # counts qualifying l1 rows, so a supplier with 3 late lines in
    # one order contributes 3); the identical per_supp subtree feeds
    # both the per-order stats and the qualifying-pair side, so the
    # planner reuses ONE lineitem shuffle (ReusedExchange) instead of
    # scanning lineitem twice.
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(late.cast("int")).alias("n_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late") > 0).cast("int"))
        .cast("bigint")
        .alias("n_late_supp"),
    )
    orders_f = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    return (
        per_supp.filter(F.col("n_late") > 0)
        .join(orders_f, F.col("l_orderkey") == orders_f.o_orderkey)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == euro_supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF+PQ as a FUNCTION of nprobe (1..3) against
    exact cosine ground truth — the probe-budget/recall trade as
    graded rows instead of a single point (extends q_ann_recall).
    Each nprobe branch shares the session codebook artifacts; the
    k-row joins are broadcast-sized."""
    from etl_deltalake_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qv = _query_vec(spark, sf_dir)
    cents = _ivf_centroids(spark, sf_dir)
    books = _pq_books(spark, sf_dir)
    exact = cosine_topk(emb, "vec_id", "embedding", qv, k=10).select("vec_id")
    out = None
    for nprobe in (1, 2, 3):
        approx = ivfpq_topk(
            emb, "vec_id", "embedding", qv, cents, books, k=10, nprobe=nprobe
        ).select("vec_id")
        row = approx.join(exact, "vec_id").agg(
            F.lit(nprobe).cast("bigint").alias("nprobe"),
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.count(F.lit(1)) / 10.0, 6).alias("recall_at_10"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


def q_lm_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM TRANSFER scoring (round 5): train the add-one MLE on
    the even-doc reference slice, score the odd docs under it
    (operators/text.bigram_lm_transfer_scores) — the held-out-model
    curation filter, vs q_lm_score's self-trained form. Unseen
    bigrams/unigrams take the smoothed fallback, so out-of-domain
    text scores low."""
    from etl_deltalake_spark.operators.text import bigram_lm_transfer_scores

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 != 0)
    return (
        bigram_lm_transfer_scores(train, score, "doc_id", "text")
        .select(F.col("doc").alias("doc_id"), "n_bigrams", "lm_score")
        .orderBy("doc_id")
    )


def q_nfc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-canonical dedup fingerprints (round 5): md5 over
    normalize_text(nfc_text(text)) — the composition that unifies
    composed/decomposed spellings before fingerprinting. The Arrow
    unicodedata kernel is graded byte-for-byte against DuckDB's
    nfc_normalize across every fixture document; the NFD-collision
    behavior itself is pinned on mixed fixtures in
    tests/test_multilingual.py."""
    from etl_deltalake_spark.operators.text import nfc_text, normalize_text

    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.md5(normalize_text(nfc_text("text"))).alias("nfc_fp"),
        (nfc_text("text") == F.col("text")).alias("already_nfc"),
    ).orderBy("doc_id")


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment through the REAL readStream path
    (round 5): events stream joined per-micro-batch with the customer
    dimension (streaming/pipeline.stream_static_enrich — the
    broadcast-dimension shape; no state store), availableNow-drained
    to a memory sink. The oracle is the plain batch join, so stream
    and batch must agree row-for-row."""
    import tempfile
    import uuid

    from etl_deltalake_spark.streaming import pipeline as P

    stream = P.read_events_stream(spark, sf_dir, sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    ckpt = tempfile.mkdtemp(prefix="sgraft_q_enrich_")
    name = f"t_{uuid.uuid4().hex[:12]}"
    q = (
        P.stream_static_enrich(stream, cust)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("event_id")


def q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image-dedup fingerprints, cross-engine graded
    (round 5): every triple of docs {3k, 3k+1, 3k+2} encodes the SAME
    closed-form luminance image three different ways (gray
    filter-cycled, gray Adam7-interlaced, RGB with r=g=b), and
    image_ahash must assign the triple ONE 64-bit fingerprint — the
    re-encoding invariance that makes groupBy(ahash) image dedup
    work. The DuckDB oracle re-derives the perceptual hash NUMERICALLY
    from the pixel formula (8×8 integer box means → threshold at the
    cell mean → MSB-first bit pack), so a decoder, pooling, or
    threshold defect anywhere in the chain hash-mismatches."""
    import pandas as pd

    from etl_deltalake_spark.operators.multimodal import image_ahash
    from etl_deltalake_spark.operators.png import encode_png

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_png(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                b = d - d % 3
                w = 8 + (b // 3) % 5
                h = 8 + (b // 3) % 3
                px = bytes((b * 31 + k) % 256 for k in range(w * h))
                mode = d % 3
                if mode == 0:
                    blob = encode_png(px, w, h, 0, "cycle")
                elif mode == 1:
                    blob = encode_png(px, w, h, 0, "cycle", interlace=True)
                else:
                    rgb = b"".join(bytes([v, v, v]) for v in px)
                    blob = encode_png(rgb, w, h, 2, "cycle")
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_png, schema="doc_id long, payload binary")
    return (
        image_ahash(media, "doc_id", "payload")
        .select("doc_id", "ahash")
        .orderBy("doc_id")
    )


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash fingerprints (round 8), cross-engine
    graded over the SAME triple re-encoded synthesis as q_image_dedup
    (gray filter-cycled / gray Adam7-interlaced / RGB r=g=b): the
    9×8-cell horizontal-gradient hash must be identical across the
    triple AND numerically equal to the DuckDB oracle's re-derivation
    (integer box means over 9-wide cells → strict adjacent-compare →
    MSB-first row-major pack). With q_image_dedup this grades BOTH
    64-bit perceptual signals the image-dedup tier ships."""
    import pandas as pd

    from etl_deltalake_spark.operators.multimodal import image_dhash
    from etl_deltalake_spark.operators.png import encode_png

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_png(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                b = d - d % 3
                w = 8 + (b // 3) % 5
                h = 8 + (b // 3) % 3
                px = bytes((b * 31 + k) % 256 for k in range(w * h))
                mode = d % 3
                if mode == 0:
                    blob = encode_png(px, w, h, 0, "cycle")
                elif mode == 1:
                    blob = encode_png(px, w, h, 0, "cycle", interlace=True)
                else:
                    rgb = b"".join(bytes([v, v, v]) for v in px)
                    blob = encode_png(rgb, w, h, 2, "cycle")
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_png, schema="doc_id long, payload binary")
    return (
        image_dhash(media, "doc_id", "payload")
        .select("doc_id", "dhash")
        .orderBy("doc_id")
    )


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-sequenced video decode, cross-engine verified
    (round 8): synthesize one deterministic APNG per document —
    2 + d%3 gray frames of w=4+d%5 × h=3+d%4, frame f's pixel k =
    (d*31 + f*17 + k) % 256, per-frame delay (1+f, 10) → 100·(1+f)
    ms — demux + decode with the pure-stdlib APNG container codec
    (operators/apng.py over png.py via multimodal.decode_video) and
    emit one graded row PER FRAME: index, dims, frame count, delay,
    exact mean. The DuckDB oracle recomputes every per-frame value
    from the closed form — a demuxer that drops a frame, misorders
    sequence numbers, or misattributes delays hash-mismatches. Both
    stages are Arrow-batched mapInPandas, zero shuffles; the
    row-per-frame fan-out happens inside the kernel."""
    import pandas as pd

    from etl_deltalake_spark.operators.apng import encode_apng
    from etl_deltalake_spark.operators.multimodal import decode_video

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_apng(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                w = 4 + d % 5
                h = 3 + d % 4
                nf = 2 + d % 3
                frames = [
                    bytes((d * 31 + f * 17 + k) % 256 for k in range(w * h))
                    for f in range(nf)
                ]
                payloads.append(
                    encode_apng(
                        frames, w, h,
                        delays=[(1 + f, 10) for f in range(nf)],
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_apng, schema="doc_id long, payload binary")
    dec = decode_video(media, "doc_id", "payload")
    return dec.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        "n_frames",
        "delay_ms",
        F.round(
            F.col("pix_sum").cast("double") / F.col("n_pix"), 6
        ).alias("mean_pixel"),
    ).orderBy("doc_id", "frame_idx")


def q_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal perceptual dedup (round 8), cross-engine graded:
    every triple of docs {3k, 3k+1, 3k+2} encodes the SAME frame
    sequence three ways (gray filter-cycled, gray filter-none, RGB
    r=g=b) and video_frame_ahash must emit identical per-frame
    hashes for the triple — frame f of doc d derives from base
    b = d - d%3 with pixel k = (b*31 + f*53 + k) % 256 over
    w=8+(b//3)%5 × h=8+(b//3)%3, nf = 2+(b//3)%3 frames. The DuckDB
    oracle re-derives every frame's aHash NUMERICALLY (8×8 integer
    box means → cell-mean threshold → MSB-first pack) — a demuxer or
    hash defect on any frame of any encoding mismatches. groupBy
    over these rows is video dedup; this row grades its signal."""
    import pandas as pd

    from etl_deltalake_spark.operators.apng import encode_apng
    from etl_deltalake_spark.operators.multimodal import video_frame_ahash

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_apng(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                b = d - d % 3
                w = 8 + (b // 3) % 5
                h = 8 + (b // 3) % 3
                nf = 2 + (b // 3) % 3
                frames = [
                    bytes((b * 31 + f * 53 + k) % 256 for k in range(w * h))
                    for f in range(nf)
                ]
                mode = d % 3
                if mode == 0:
                    blob = encode_apng(frames, w, h, filter_mode="cycle")
                elif mode == 1:
                    blob = encode_apng(frames, w, h, filter_mode="none")
                else:
                    rgb = [
                        b"".join(bytes([v, v, v]) for v in fr)
                        for fr in frames
                    ]
                    blob = encode_apng(rgb, w, h, color_type=2)
                payloads.append(blob)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(make_apng, schema="doc_id long, payload binary")
    return (
        video_frame_ahash(media, "doc_id", "payload")
        .select("doc_id", "frame_idx", "n_frames", "frame_ahash")
        .orderBy("doc_id", "frame_idx")
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction, cross-engine graded (round 8): per
    document synthesize an HTML page whose prose segments derive
    from a closed form (segment i = 'w' + (d*7 + i*13) % 1000;
    3 + d%4 segments) wrapped in real markup — title, attributes,
    nested tags, a script whose string contains markup (CDATA
    handling), a style block, a comment, and the &amp;/&#233;
    character references. extract_html_text must produce exactly the
    whitespace-normalized token join of (title, h1, p-segments, '&',
    'é', div segments); the DuckDB oracle REBUILDS that expected
    text from the same closed form (no parsing) and compares md5 +
    char/token counts — a parser that leaks script text, drops a
    text node, mishandles entities, or collapses whitespace
    differently mismatches immediately."""
    import pandas as pd

    from etl_deltalake_spark.operators.html_text import extract_html_text

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_html(batches):
        for pdf in batches:
            pages = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                n_seg = 3 + d % 4
                seg = [f"w{(d * 7 + i * 13) % 1000}" for i in range(n_seg)]
                rest = " ".join(seg[3:])
                pages.append(
                    f'<html><head><title>{seg[0]}</title>'
                    f'<script type="text/javascript">'
                    f'var x = "<b>IGNORED {d}</b>";</script>'
                    "<style>p { color: red; }</style></head>"
                    f'<body>\n<h1 class="t">{seg[1]}</h1>'
                    f"<p>{seg[2]} &amp; &#233;</p>"
                    f"<!-- IGNORED {d} -->"
                    f'<div id="z">{rest}</div></body></html>'
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "page": pages}
            )

    pages = docs.mapInPandas(make_html, schema="doc_id long, page string")
    out = extract_html_text(pages, "doc_id", "page")
    return out.select(
        "doc_id",
        "n_chars",
        "n_words",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    ).orderBy("doc_id")


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization, cross-engine graded (round 8): every
    quintuple of docs {5k..5k+4} carries a different syntactic
    variant of the SAME resource (verbatim; uppercase+default-port;
    dot-segments; param-order+fragment; trailing-dot host + port +
    param order) built from closed-form components of base
    b = d - d%5. canonical_url must collapse all five to one string
    — rebuilt directly by the DuckDB oracle — while the JVM-side
    parse_url features (host, path depth) grade per-variant. This
    row is the crawl-frontier dedup signal: groupBy(canon) IS the
    dedup, and the oracle proves the key is right."""
    import pandas as pd

    from etl_deltalake_spark.operators.urls import canonical_url, url_features

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_url(batches):
        for pdf in batches:
            urls = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                g = (d - d % 5) // 5
                m, p, x, y = g % 40, g % 7, g % 9, g % 11
                mode = d % 5
                if mode == 0:
                    u = f"http://site{m}.example/a{p}/c?k1={x}&k2={y}"
                elif mode == 1:
                    u = f"HTTP://SITE{m}.EXAMPLE:80/a{p}/c?k1={x}&k2={y}"
                elif mode == 2:
                    u = (
                        f"http://site{m}.example/a{p}/./zz/../c"
                        f"?k1={x}&k2={y}"
                    )
                elif mode == 3:
                    u = f"http://site{m}.example/a{p}/c?k2={y}&k1={x}#frag"
                else:
                    u = f"http://site{m}.example.:80/a{p}/c?k2={y}&k1={x}"
                urls.append(u)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "url": urls}
            )

    urls = docs.mapInPandas(make_url, schema="doc_id long, url string")
    out = url_features(urls, "url").withColumn(
        "canon", canonical_url("url")
    )
    return out.select("doc_id", "canon", "url_host", "url_depth").orderBy(
        "doc_id"
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl front door in ONE graded row (round 8): per
    document synthesize a WARC archive (1 warcinfo + 2 + d%3 HTTP
    response records, each wrapping a closed-form HTML page with a
    messy closed-form URL), then run the real pipeline —
    warc_records (container + HTTP parse) → canonical_url (frontier
    key) → extract_html_text (prose) — and emit one row per response
    with the canonical URL, status, and extracted-text md5/counts.
    The DuckDB oracle rebuilds every value from the closed forms
    (record r of doc d: segments 'w'+(d*7+r*29+i*13)%1000 over
    3+(d+r)%4 segments; URL HTTP://SITE{(d+r)%40}.EXAMPLE:80/p{r} →
    canonical http://site{...}.example/p{r}) — a defect in the WARC
    walk, the HTTP split, the URL rules, or the HTML contract
    mismatches. Three round-8 operators composed and cross-engine
    verified together. Round 11: odd doc_ids ship as ``.warc.gz``
    (one gzip member per record, the real Common Crawl transport)
    and even doc_ids as bare WARC, so the member-at-a-time demux is
    driver-graded at every scale — a gzip-path defect mismatches
    half the rows."""
    import pandas as pd

    from etl_deltalake_spark.operators.html_text import html_to_text
    from etl_deltalake_spark.operators.urls import canonical_url
    from etl_deltalake_spark.operators.warc import (
        encode_warc,
        encode_warc_gz,
        warc_records,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def page(d: int, r: int) -> str:
        n_seg = 3 + (d + r) % 4
        seg = [f"w{(d * 7 + r * 29 + i * 13) % 1000}" for i in range(n_seg)]
        rest = " ".join(seg[3:])
        return (
            f"<html><head><title>{seg[0]}</title>"
            f'<script>var x = "<b>IGNORED {d}.{r}</b>";</script>'
            "<style>p { color: red; }</style></head>"
            f"<body><h1>{seg[1]}</h1>"
            f"<p>{seg[2]} &amp; &#233;</p>"
            f"<!-- IGNORED -->"
            f'<div id="z">{rest}</div></body></html>'
        )

    def make_warc(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                recs = [{"warc_type": "warcinfo", "body": b"robots: all\r\n"}]
                for r in range(2 + d % 3):
                    recs.append(
                        {
                            "warc_type": "response",
                            "url": (
                                f"HTTP://SITE{(d + r) % 40}.EXAMPLE:80"
                                f"/p{r}"
                            ),
                            "html": page(d, r),
                        }
                    )
                enc = encode_warc_gz if d % 2 else encode_warc
                payloads.append(enc(recs))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    archives = docs.mapInPandas(
        make_warc, schema="doc_id long, payload binary"
    )
    recs = warc_records(archives, "doc_id", "payload").filter(
        F.col("warc_type") == "response"
    )
    pages = recs.select(
        "doc_id",
        (F.col("rec_idx") - 1).alias("resp_idx"),  # warcinfo is rec 0
        "http_status",
        canonical_url("url").alias("canon"),
        html_to_text(F.col("body").cast("string")).alias("text"),
    )
    return pages.select(
        "doc_id",
        "resp_idx",
        "http_status",
        "canon",
        F.when(F.length("text") == 0, F.lit(0).cast("long"))
        .otherwise(F.size(F.split(F.col("text"), " ")).cast("long"))
        .alias("n_words"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    ).orderBy("doc_id", "resp_idx")


def q_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl politeness, cross-engine graded (round 8): a frontier
    of closed-form URLs (doc d → host site{d%10}.example, path
    /p{d%7}/x) joins broadcast per-host robots.txt payloads — host m
    (m < 9) disallows prefix /p{m%5} for agent trainbot and
    EVERYTHING for other agents (so an agent-section matching bug
    blocks all rows and cannot hide); host 9 has no robots row →
    fetchable by crawler convention. robots_filter must reproduce
    the closed-form verdict fetchable ⇔ host has no robots OR
    d%7 ≠ (d%10)%5, which the DuckDB oracle computes directly. The
    robots side is per-host (tiny, broadcast); the frontier never
    shuffles."""
    from etl_deltalake_spark.operators.crawl import robots_filter

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    urls = docs.select(
        F.col("doc_id").alias("url_id"),
        F.concat(
            F.lit("http://site"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example/p"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("/x"),
        ).alias("url"),
        F.concat(
            F.lit("site"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example"),
        ).alias("host"),
    )
    robots = spark.createDataFrame(
        [
            (
                f"site{m}.example",
                (
                    f"User-agent: trainbot\nDisallow: /p{m % 5}\n\n"
                    "User-agent: *\nDisallow: /\n"
                ),
            )
            for m in range(9)  # host 9 publishes no robots.txt
        ],
        "host string, robots_txt string",
    )
    out = robots_filter(urls, robots, agent="trainbot")
    return out.select("url_id", "host", "fetchable").orderBy("url_id")


def q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aware chunking, cross-engine graded (round 8): per
    doc synthesize 4 + d%5 sentences where sentence j is
    1 + (d + 3j) % 5 copies of the word s{d}_{j} ending in '.', then
    greedily pack whole sentences into 7-token chunks
    (packing.sentence_chunks over the shared sentence splitter). The
    DuckDB oracle replays the greedy rule as a recursive
    running-sum-with-reset over the closed-form sentence lengths and
    rebuilds every chunk's exact text — a chunker that splits a
    sentence, misorders, off-by-ones the budget, or drops the
    over-budget-singleton case mismatches."""
    import pandas as pd

    from etl_deltalake_spark.operators.packing import sentence_chunks

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_text(batches):
        for pdf in batches:
            texts = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                sents = []
                for j in range(4 + d % 5):
                    w = 1 + (d + 3 * j) % 5
                    word = f"s{d}_{j}"
                    sents.append(" ".join([word] * w) + ".")
                texts.append(" ".join(sents))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "text": texts}
            )

    txt = docs.mapInPandas(make_text, schema="doc_id long, text string")
    return (
        sentence_chunks(txt, "doc_id", "text", budget_tokens=7)
        .select(
            "doc",
            "chunk_idx",
            "n_sentences",
            "n_tokens",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
        )
        .orderBy("doc", "chunk_idx")
    )


def q_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Hamming-ball pair mining, cross-engine graded (round
    8): doc quadruples share a closed-form 64-bit base fingerprint
    (LCG of g = d//4); members flip 0 / 1 / 3 / 9 disjoint bits, so
    each group contributes exactly the pairs at distance 1, 3, 4 and
    the 9-bit member joins nothing at max_dist=4.
    dedup.hamming_near_pairs mines pairs via pigeonhole banding (5
    bands, equi-join candidates, exact bit_count verify); the DuckDB
    oracle brute-forces ALL pairs over the same closed-form hashes —
    banding that loses a candidate (breaking the pigeonhole
    guarantee) or a popcount/slice defect mismatches. The generic
    scale form behind aHash/dHash/SimHash near-dup."""
    import pandas as pd

    from etl_deltalake_spark.operators.dedup import hamming_near_pairs

    docs = load_table(spark, "documents", sf_dir).select("doc_id")

    def make_hash(batches):
        for pdf in batches:
            hashes = []
            for d in pdf["doc_id"].astype("int64"):
                d = int(d)
                g, m = d // 4, d % 4
                h = (g * 2862933555777941757 + 3037000493) % (1 << 64)
                offsets = {
                    0: (),
                    1: (0,),
                    2: (7, 13, 29),
                    3: (1, 2, 3, 4, 5, 6, 8, 9, 10),
                }[m]
                for off in offsets:
                    h ^= 1 << ((g + off) % 64)
                if h >= 1 << 63:
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "fp": hashes}
            )

    fps = docs.mapInPandas(make_hash, schema="doc_id long, fp long")
    return hamming_near_pairs(fps, "doc_id", "fp", max_dist=4).orderBy(
        "doc_a", "doc_b"
    )


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of per-user hourly value sums
    (operators/timeseries.seasonal_decompose): centered moving-average
    trend, phase-of-day seasonal means from exact decimal sums,
    residuals — value = trend + seasonal + resid, bitwise
    cross-engine."""
    from etl_deltalake_spark.operators.timeseries import seasonal_decompose

    ev = load_table(spark, "events", sf_dir)
    return seasonal_decompose(
        ev, "user_id", "ts", "value", period=24, half_window=2
    ).orderBy("key", "bucket")


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over customer quasi-identifiers
    (operators/pii.k_anonymity / k_anonymity_report): per-row
    anonymity-set sizes for (c_mktsegment, c_nationkey) at k=5,
    summarized — the release-readiness check of the PII family."""
    from etl_deltalake_spark.operators.pii import k_anonymity

    cust = load_table(spark, "customer", sf_dir)
    return (
        k_anonymity(cust, ["c_mktsegment", "c_nationkey"], k=5)
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_nationkey",
            "anon_set_size",
            "suppress",
        )
        .orderBy("c_custkey")
    )


def q_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance, cross-engine graded
    (operators/rollups.join_view_delta): orders split on key mod 4,
    lineitem split INDEPENDENTLY on line number parity — so all
    three delta-rule terms (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB) are non-empty; the
    maintained view = materialized base join ∪ the delta terms,
    aggregated to revenue per order priority. The oracle recomputes
    the FULL join — any missed or duplicated delta term diverges.
    The base ⋈ base term is the only one the maintenance never
    re-executes."""
    from etl_deltalake_spark.operators.rollups import join_view_delta

    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    old_o = orders.filter(F.col("o_orderkey") % 4 != 0)
    new_o = orders.filter(F.col("o_orderkey") % 4 == 0)
    old_l = li.filter(F.col("l_linenumber") % 2 == 1)
    new_l = li.filter(F.col("l_linenumber") % 2 == 0)
    j_old = old_o.join(old_l, old_o.o_orderkey == old_l.l_orderkey)
    delta = join_view_delta(
        old_o.withColumnRenamed("o_orderkey", "k"),
        new_o.withColumnRenamed("o_orderkey", "k"),
        old_l.withColumnRenamed("l_orderkey", "k"),
        new_l.withColumnRenamed("l_orderkey", "k"),
        ["k"],
    )
    view = j_old.select(
        "o_orderpriority", F.col("l_extendedprice").alias("price")
    ).unionByName(
        delta.select(
            "o_orderpriority", F.col("l_extendedprice").alias("price")
        )
    )
    return (
        view.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def q_weighted_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional document sampling without replacement
    (operators/curation.weighted_sample — hash-deterministic
    Efraimidis-Spirakis): 200 docs drawn with probability
    proportional to length(text) — the quality/size-weighted
    subsampling step of corpus curation, reproducible bit-for-bit
    across engines."""
    from etl_deltalake_spark.operators.curation import weighted_sample

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "n_chars", F.length("text").cast("double")
    )
    return (
        weighted_sample(docs, "doc_id", "n_chars", n=200)
        .select("doc_id", "n_chars", "priority")
        .orderBy("priority", "doc_id")
    )


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment pairs over documents
    (operators/dedup.containment_pairs): |A∩B|/|A| per direction at
    a 0.8 threshold — the subset/boilerplate detector symmetric
    Jaccard misses."""
    from etl_deltalake_spark.operators.dedup import containment_pairs

    docs = load_table(spark, "documents", sf_dir)
    return containment_pairs(docs, "doc_id", "text", k=3, threshold=0.8).orderBy(
        "doc_a", "doc_b"
    )


def q_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Tukey-fence outlier summary on extended price
    (operators/stats.tukey_outliers): exact interpolated quartiles →
    1.5·IQR fences → beyond-fence counts, the box-plot outlier rule
    alongside the z-score and MAD detectors."""
    from etl_deltalake_spark.operators.stats import tukey_outliers

    li = load_table(spark, "lineitem", sf_dir)
    return tukey_outliers(li, ["l_returnflag"], "l_extendedprice").orderBy(
        "l_returnflag"
    )


def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export manifest (round 8,
    operators/curation.shard_manifest): every document gets a shard
    (first 8 md5 hex digits of "7:{doc_id}" as an int mod 8) and a
    1-based position within its shard under full-digest order — the
    global pseudo-random training order a dataloader replays. The
    DuckDB oracle re-derives digest, shard, and rank; a prefix-parse
    or mod-sign defect, an unstable tiebreak, or a nondeterministic
    shuffle all mismatch. One hash-partitioned window, no global
    sort — the manifest shares write_shards' single exchange at
    100 TB."""
    from etl_deltalake_spark.operators.curation import shard_manifest

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return (
        shard_manifest(docs, "doc_id", n_shards=8, seed=7)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def q_scalar_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style scalar quantization of the embeddings table (round
    8, operators/similarity.sq_calibrate + sq_quantize_long):
    per-dimension [min, max] calibration in one partial-aggregated
    pass, then an affine 256-code quantize + dequantize per (vector,
    dim) via a BROADCAST join on the dim-count stats table. The
    DuckDB oracle re-derives extrema, codes, and reconstructions
    with the identical expression chain — an off-by-half rounding,
    a flipped clamp, or min/max drift all mismatch. The compact
    array layout (sq_quantize) is unit-gated elementwise-equal to
    this long form."""
    from etl_deltalake_spark.operators.similarity import (
        sq_calibrate,
        sq_quantize_long,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    stats = sq_calibrate(emb, "embedding")
    return (
        sq_quantize_long(emb, "vec_id", "embedding", stats)
        .orderBy("vec_id", "dim")
    )


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear clustering, skipping-effectiveness graded
    (round 8, operators/partitioning.layout_skipping_stats): quantize
    events to a 1024x1024 grid via coprime multiplicative mixing
    (x = 53*event_id mod 1024, y = (193*event_id + 7) mod 1024 — the
    deterministic stand-in for upstream dictionary-encode/quantize;
    the raw id domains are too narrow at small SF to exercise the
    grid), bucket rows by the top 5 bits of the Morton
    interleave vs of the leading column, and emit per-bucket zone-map
    min/max with touch flags for one band predicate per dimension.
    The DuckDB oracle re-derives the 20-term bit interleave and both
    bucketings exactly — one swapped bit lane, shift, or clamp
    mismatches. The headline claim is IN the graded rows: under
    zorder few buckets touch the y-band (pruning on a non-leading
    dimension), under linear all of them do."""
    from etl_deltalake_spark.operators.partitioning import (
        layout_skipping_stats,
    )

    ev = load_table(spark, "events", sf_dir)
    return layout_skipping_stats(
        ev,
        (F.col("event_id") * 53) % 1024,
        (F.col("event_id") * 193 + 7) % 1024,
    ).orderBy("layout", "bucket")


def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured path (round 8): build a nested JSON
    doc per event, parse ONCE to Spark's binary VARIANT type, then
    probe typed paths with variant_get — object fields, a 0-based
    array index, a missing path (null-safe), plus a try_parse_json
    gate over a deterministically-malformed sibling column. This is
    the modern lakehouse semi-structured story q_json_funcs'
    string-side get_json_object cannot tell: at 100 TB you parse text
    once at ingest, store the binary variant (shredding-ready), and
    every later path probe is a binary traversal, not a re-parse.
    The DuckDB oracle re-derives every extraction with its JSON
    functions — a 1-based index, a lost null, or a malformed row
    slipping through all mismatch.

    No counterpart in the reference (flat JSON normalize only,
    main.py:64-77); SURVEY §2.8 scalar-function family extension."""
    ev = load_table(spark, "events", sf_dir)
    js = F.concat(
        F.lit('{"u":'),
        F.col("user_id").cast("string"),
        F.lit(',"tags":["t'),
        (F.col("user_id") % 5).cast("string"),
        F.lit('","t'),
        (F.col("event_id") % 7).cast("string"),
        F.lit('"],"m":{"v":'),
        F.floor(F.col("value")).cast("long").cast("string"),
        F.lit(',"t":"'),
        F.col("event_type"),
        F.lit('"}}'),
    )
    # every 10th event gets an unclosed object — must parse to NULL,
    # not error, under try_parse_json
    js_bad = F.when(
        F.col("event_id") % 10 == 0, F.lit('{"u":')
    ).otherwise(js)
    v = F.parse_json(js)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.u", "bigint").alias("u"),
        F.variant_get(v, "$.tags[1]", "string").alias("tag1"),
        F.variant_get(v, "$.m.v", "bigint").alias("mv"),
        F.variant_get(v, "$.m.t", "string").alias("typ"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
        F.when(F.try_parse_json(js_bad).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("parse_ok"),
    ).orderBy("event_id")


def q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV mergeable distinct sketch (round 8, operators/stats.
    kmv_sketch_est): per-event-type distinct-user estimates from the
    k=8 smallest md5-60bit hashes, plus a __union__ row merged from
    sketch contents alone. Unlike HLL (engine-private registers) the
    whole sketch is re-derivable: the DuckDB oracle recomputes the
    hashes, the per-group top-8, the kth minimum, and the
    (k-1)*2^60/h_k estimator exactly — a wrong rank bound, a lost
    exact branch, or a union that re-touches the data all mismatch."""
    from etl_deltalake_spark.operators.stats import kmv_sketch_est

    ev = load_table(spark, "events", sf_dir)
    return kmv_sketch_est(
        ev, F.col("event_type"), F.col("user_id"), k=8
    ).orderBy("grp")


def q_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (round 8, operators/reconcile.
    resolve_entities): synthesize a dirty two-records-per-customer
    feed — the variant record appends a typo to the name (edit
    distance 1), nulls its balance, nulls its phone on %4 keys, and
    on %5 keys takes an entirely different 'Anon#' name (a same-block
    IMPOSTOR the fuzzy gate must reject) — then block on the digit
    key extracted from the name, verify with Levenshtein <= 2,
    cluster by min-label propagation (singletons preserved), and
    survive each attribute from its latest non-null carrier. The
    DuckDB oracle replays blocking, the edit-distance gate, four
    propagation rounds, and arg_max survivorship — a merged impostor,
    a lost singleton, or a null phone erasing the known one all
    mismatch."""
    from etl_deltalake_spark.operators.reconcile import resolve_entities

    cust = load_table(spark, "customer", sf_dir)
    phone = F.concat(
        F.lit("555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    digits = F.regexp_extract(F.col("c_name"), "([0-9]+)", 1)
    rec_a = cust.select(
        (F.col("c_custkey") * 2).alias("rec_id"),
        F.col("c_name").alias("name"),
        phone.alias("phone"),
        F.col("c_acctbal").alias("bal"),
        F.lit(1).alias("seq"),
    )
    rec_b = cust.select(
        (F.col("c_custkey") * 2 + 1).alias("rec_id"),
        F.when(
            F.col("c_custkey") % 5 == 0, F.concat(F.lit("Anon#"), digits)
        )
        .otherwise(F.concat(F.col("c_name"), F.lit(".")))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, F.lit(None)).otherwise(phone)
        .alias("phone"),
        F.lit(None).cast("double").alias("bal"),
        F.lit(2).alias("seq"),
    )
    recs = rec_a.unionByName(rec_b)
    return resolve_entities(
        recs,
        "rec_id",
        "name",
        F.regexp_extract(F.col("name"), "([0-9]+)", 1),
        "seq",
        ["name", "phone", "bal"],
        max_dist=2,
    ).orderBy("cluster")


def q_homoglyph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial dedup via confusables folding (round 8,
    operators/text.fold_confusables): synthesize evasive duplicates —
    for %7 docs a shadow copy whose Latin 'aeo' are swapped for
    Cyrillic 'аео' (the classic exact-hash-dedup evasion; every
    affected shingle changes, so MinHash mostly misses it too) — then
    fingerprint the corpus twice: naive md5(text) vs md5 of the
    confusables-folded text. Output per doc: both duplicate-group
    sizes. The graded story is IN the rows: shadows merge with their
    originals only under the folded fingerprint. The DuckDB oracle
    replays the shadow synthesis, the exact fold table (string-pinned
    to text.CONFUSABLES_FROM/TO), and both group counts."""
    from etl_deltalake_spark.operators.text import fold_confusables

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    shadow = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.translate(F.col("text"), "aeo", "аео").alias("text"),
    )
    corpus = docs.unionByName(shadow)
    w_naive = Window.partitionBy(F.md5(F.col("text")))
    w_fold = Window.partitionBy(F.md5(fold_confusables(F.col("text"))))
    return corpus.select(
        "doc_id",
        (F.col("doc_id") >= 1000000).cast("int").alias("is_shadow"),
        F.count(F.lit(1)).over(w_naive).alias("n_naive"),
        F.count(F.lit(1)).over(w_fold).alias("n_folded"),
    ).orderBy("doc_id")


def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between document sources from KMV sketches
    (round 8, operators/stats.kmv_jaccard): tokenize each source's
    documents under THE shared token definition, sketch each source's
    vocabulary as its 64 smallest md5-60bit term hashes, surface
    candidate pairs by equi-joining sketches on the hash (the
    evidence-driven move that avoids enumerating all group pairs at
    scale), then estimate J as the both-sides fraction of the pooled
    top-64 minima. The DuckDB oracle replays tokenization, sketches,
    candidate surfacing, pooling, and the estimator exactly."""
    from etl_deltalake_spark.operators.stats import kmv_jaccard
    from etl_deltalake_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(tokens("text")).alias("term")
    )
    return kmv_jaccard(
        toks, F.col("source"), F.col("term"), k=64
    ).orderBy("grp_a", "grp_b")


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution report (round 8, operators/behavior.attribution):
    per purchase event, the first and last click/view touch of the
    same user within a 3-day lookback under a total (ts, event_id)
    order, aggregated into (first_touch, last_touch, n_conversions)
    cells with unattributed purchases kept as null/null. The DuckDB
    oracle replays the windowed join and both endpoints exactly —
    an off-by-one window bound, a lost tiebreak, or dropped
    unattributed rows all mismatch."""
    from etl_deltalake_spark.operators.behavior import attribution

    ev = load_table(spark, "events", sf_dir)
    per_conv = attribution(
        ev,
        "user_id",
        "ts",
        "event_id",
        "event_type",
        conversion_type="purchase",
        touch_types=["click", "view"],
        lookback_days=3,
    )
    return (
        per_conv.groupBy("first_touch", "last_touch")
        .agg(F.count(F.lit(1)).alias("n_conversions"))
        .orderBy("first_touch", "last_touch")
    )


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist safety audit (round 8, operators/curation.
    blocklist_report): count occurrences of a three-term blocklist
    per document under the shared tokenizer (broadcast term join —
    the corpus never shuffles) and keep docs within a 4-hit budget;
    zero-hit docs must survive the left join. The DuckDB oracle
    re-tokenizes and recounts exactly — an inner-join drop of clean
    docs, distinct-vs-occurrence confusion, or an off-by-one on the
    budget all mismatch."""
    from etl_deltalake_spark.operators.curation import blocklist_report

    docs = load_table(spark, "documents", sf_dir)
    terms = spark.createDataFrame(
        [("merge",), ("window",), ("dup",)], "term string"
    )
    return blocklist_report(
        docs, "doc_id", "text", terms, max_hits=4
    ).orderBy("doc_id")


def q_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free point-in-time feature matrix (round 8): per
    event, trailing-3-day behavioral features computed over a RANGE
    window frame that ends ONE SECOND BEFORE the event — the
    training-serving-skew rule that only the past may enter a
    feature — plus recency (gap to the user's previous event under a
    total order) and a broadcast dimension attribute. The monetary
    sum is EXACT INTEGER CENTS — ``floor(value*100 + 0.5)`` is pure
    IEEE-754 double arithmetic plus an exact floor, so both engines
    derive bit-identical bigints from the same parquet doubles with
    NO DOUBLE→DECIMAL cast left on any graded column (a cast whose
    half-way rounding path is engine-version-dependent — the round-9
    driver divergence). The DuckDB oracle replays the epoch-second
    range frame, the lag, and the join — an off-by-one frame bound
    (current row leaking into its own features) mismatches
    immediately."""
    ev = load_table(spark, "events", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch"),
        F.floor(F.col("value") * 100 + 0.5).alias("val_cents"),
    )
    w3d = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-3 * 86400, -1)
    )
    wlag = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    feat = base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w3d).alias("n_prior_3d"),
        F.coalesce(F.sum("val_cents").over(w3d), F.lit(0))
        .cast("long")
        .alias("sum_prior_3d_cents"),
        (F.col("epoch") - F.lag("epoch").over(wlag)).alias("gap_s"),
    )
    dim = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return feat.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "n_prior_3d", "sum_prior_3d_cents", "gap_s", "segment"
    ).orderBy("event_id")


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift monitor (round 8) — the serving-side companion of
    q_feature_matrix: split events into a reference and a current
    population at a fixed time boundary, bin the value feature into
    10 fixed-width bins, Laplace-smooth the two distributions, and
    emit the per-bin PSI terms plus the total. The per-bin term is
    rounded then summed as an exact decimal so the total is
    order-free across engines. The DuckDB oracle replays binning,
    smoothing, and both aggregates exactly. PSI is the standard
    drift gate (>0.2 = retrain); KL over word distributions
    (q_corpus_kl) covers the text side, this covers numeric
    features."""
    ev = load_table(spark, "events", sf_dir)
    binned = ev.select(
        F.least(F.lit(9), F.floor(F.col("value") / 35).cast("int")).alias(
            "bin"
        ),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("is_ref"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = counts.join(F.broadcast(tot))
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + 10).cast(
        "double"
    )
    q = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + 10).cast(
        "double"
    )
    term = F.round((p - q) * F.log(p / q), 6)
    w = Window.partitionBy()
    return (
        j.select(
            "bin",
            "n_ref",
            "n_cur",
            term.alias("term"),
        )
        .withColumn(
            "psi",
            F.sum(F.col("term").cast("decimal(18,6)")).over(w),
        )
        .orderBy("bin")
    )


def q_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking label generation (round 8) — the other half of
    the training-set factory: q_feature_matrix takes features from
    the strictly-past window, this takes LABELS from the strictly-
    future one. Per event: did the user act again within 7 days
    (label_7d, the return/churn target), over a RANGE frame starting
    one second after the row, plus the exact gap to the next event
    under a total (epoch, event_id) order. Past and future frames
    cannot overlap, so a training set joining the two on event_id is
    leakage-free by construction. The DuckDB oracle replays both
    frames exactly."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("epoch")
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(1, 7 * 86400)
    )
    wnext = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    return base.select(
        "event_id",
        (F.count(F.lit(1)).over(w7) > 0).cast("int").alias("label_7d"),
        (F.lead("epoch").over(wnext) - F.col("epoch")).alias("next_gap_s"),
    ).orderBy("event_id")


def q_null_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti-join semantics (round 8) — the classic
    three-valued-logic trap: ``key NOT IN (subquery)`` must return
    ZERO rows when the subquery contains a single NULL (every
    comparison is UNKNOWN), while the look-alike anti-join / NOT IN
    over the null-filtered subquery returns the real complement.
    Both variants run as SQL NOT IN so Spark plans its null-aware
    anti join, and the oracle replays the identical SQL — an engine
    that 'helpfully' filters the null (or an anti-join rewrite that
    ignores it) mismatches. Output: one row per variant with its
    count."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("na_events")
    # probe set: user ids seen on 'error' events, plus an injected
    # NULL in the with_null variant
    return spark.sql(
        """
        WITH probe AS (
          SELECT user_id AS u FROM na_events
          WHERE event_type = 'error' AND user_id % 4 = 0
        ),
        with_null AS (
          SELECT u FROM probe UNION ALL SELECT CAST(NULL AS BIGINT)
        ),
        v1 AS (
          SELECT 'not_in_with_null' AS variant, count(*) AS n
          FROM na_events WHERE user_id NOT IN (SELECT u FROM with_null)
        ),
        v2 AS (
          SELECT 'not_in_null_filtered' AS variant, count(*) AS n
          FROM na_events
          WHERE user_id NOT IN (
            SELECT u FROM with_null WHERE u IS NOT NULL
          )
        )
        SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY variant
        """
    )


def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (round 8, Spark 4 collations):
    synthesize case-variant segment names (upper/lower/initcap by key
    mod), group under the UTF8_LCASE collation — case variants merge
    in ONE shuffle with no expression rewriting — and report per
    folded segment the row count and how many distinct BINARY
    variants folded into it. The group key is re-lowered on output
    because a collated group's representative value is
    first-seen (nondeterministic); the DuckDB oracle replays the
    fold with lower()."""
    cust = load_table(spark, "customer", sf_dir)
    name = (
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
    )
    return (
        cust.select(name.alias("seg_raw"))
        .groupBy(F.collate("seg_raw", "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.collate("seg_raw", "UTF8_BINARY")).alias(
                "n_variants"
            ),
        )
        .select(
            F.lower(F.col("k")).alias("seg"), "n_rows", "n_variants"
        )
        .orderBy("seg")
    )


def q_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (round 8, Spark 4.1 WITH RECURSIVE): walk a
    synthetic reporting tree (parent = key div 10, root 0) from the
    root down, computing each node's depth — transitive closure in
    PURE SQL, where operators/graph.py's iterative DataFrame loop was
    previously the only path. Spark executes the recursion as
    iterative union steps under the hood (same plan family as the
    loop, now engine-managed). The DuckDB oracle runs its own
    recursive CTE — a missed level, a duplicated frontier, or an
    off-by-one depth all mismatch."""
    ev = load_table(spark, "customer", sf_dir)
    ev.createOrReplaceTempView("rec_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, depth) AS (
          SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
          UNION ALL
          SELECT b.k, w.depth + 1
          FROM (
            SELECT c_custkey AS k, c_custkey DIV 10 AS parent
            FROM rec_customer WHERE c_custkey <> 0
          ) b
          JOIN walk w ON b.parent = w.node
        )
        SELECT node, depth FROM walk ORDER BY node
        """
    )


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-surface pair (round 8): a declarative SQL UDF
    (CREATE FUNCTION ... RETURN expr — catalog-resident, codegen'd,
    no Python worker) used inside a PIPE-SYNTAX query (|> EXTEND /
    AGGREGATE / ORDER BY). Revenue sums go through exact decimals
    (the repo-wide cross-engine float rule). The DuckDB oracle
    computes the same aggregation in classic SQL — proving the sugar
    changes nothing semantically."""
    li = load_table(spark, "lineitem", sf_dir)
    li.createOrReplaceTempView("sqlsurf_lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_rev(
          p DECIMAL(18,2), d DECIMAL(18,2))
        RETURNS DECIMAL(37,4) RETURN p * (1 - d)
        """
    )
    return spark.sql(
        """
        FROM sqlsurf_lineitem
        |> EXTEND disc_rev(CAST(l_extendedprice AS DECIMAL(18,2)),
                           CAST(l_discount AS DECIMAL(18,2))) AS rev
        |> AGGREGATE
             CAST(SUM(rev) AS DECIMAL(38,4)) AS revenue,
             count(*) AS n
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1 SQL SCRIPTING (round 9 — extends the round-8 SQL
    frontier set): a BEGIN…END block with DECLARE + WHILE driving a
    REAL iterative algorithm, the robust trimmed-threshold estimator
    — each pass recomputes the outlier cutoff as 2× the mean of the
    rows under the previous cutoff (a data-dependent loop no single
    SQL statement expresses). Decimal-exact mean (exact decimal sum →
    double ÷ count) keeps every iterate bitwise reproducible, so the
    DuckDB oracle replays the loop UNROLLED as three chained CTEs."""
    li = load_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    li.createOrReplaceTempView("li_script")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT CAST('Infinity' AS DOUBLE);
          DECLARE i INT DEFAULT 0;
          WHILE i < 3 DO
            SET thr = (
              SELECT 2.0 * (
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / COUNT(*)
              )
              FROM li_script WHERE l_extendedprice <= thr
            );
            SET i = i + 1;
          END WHILE;
          SELECT ROUND(thr, 6) AS trimmed_threshold,
                 (SELECT COUNT(*) FROM li_script
                  WHERE l_extendedprice <= thr) AS n_kept;
        END
        """
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-bounded semantic near-dup mining (round 9,
    similarity.semantic_dedup_pairs — the SemDeDup pattern): IVF
    assignment against the session's deterministic centroids, then
    within-cluster cosine pairs at tau=0.3. The fixture's synthetic
    embeddings are near-orthogonal (max within-cluster cosine ≈0.47
    at sf0.001), so the graded tau sits inside the fixture's
    similarity range to keep the full path non-empty at every scale;
    the OPERATOR takes any tau (production semantic dedup runs
    ~0.95+) — the drop-verdict form is behavior-tested with real
    duplicate embeddings in pytest. The DuckDB oracle re-derives
    assignment argmax, the cluster-bounded pair join, and the
    rounded cosine exactly."""
    from etl_deltalake_spark.operators.similarity import semantic_dedup_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_centroids(spark, sf_dir)
    return semantic_dedup_pairs(
        emb, "vec_id", "embedding", cents, tau=0.3
    ).orderBy("doc_a", "doc_b")


def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT Jaccard near-dup pairs (round 9,
    dedup.jaccard_prefix_pairs — the All-Pairs/PPJoin family): the
    provably-lossless scale path for exact set-similarity dedup.
    The DuckDB oracle is the EXHAUSTIVE all-pairs shared-shingle
    join with no candidate pruning at all, so the prefix filter's
    completeness theorem is cross-engine-verified on every run —
    one lost pair hash-fails."""
    from etl_deltalake_spark.operators.dedup import jaccard_prefix_pairs

    docs = load_table(spark, "documents", sf_dir)
    return jaccard_prefix_pairs(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).orderBy("doc_a", "doc_b")


def q_quality_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier over documents (round 9,
    text.nb_quality_scores) — the CCNet/fastText curation pattern:
    train multinomial Naive Bayes on the even-doc_id half
    (self-supervised label: stopword_ratio ≥ 0.06, natural-prose
    heuristic around the corpus median), score the odd half
    including out-of-vocabulary fallback and class-prior log-odds.
    All log terms quantize to DECIMAL(20,10) before summing (the
    bigram-LM precedent), so the DuckDB oracle replays training AND
    scoring bitwise."""
    from etl_deltalake_spark.operators.text import (
        nb_quality_scores,
        stopword_ratio,
    )

    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    score = docs.filter(F.col("doc_id") % 2 == 1)
    return nb_quality_scores(
        train, score, "doc_id", "text",
        label=stopword_ratio("text") >= 0.06,
    ).orderBy("doc")


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (round 8; made scale-safe in round 9) — the
    classic customer-value grid: per user, recency (whole days from
    their last event to the corpus max), frequency (event count),
    monetary (exact decimal value sum floored to whole units), each
    scored 1-5 against exact quintile BOUNDARIES, then the segment
    grid aggregated.

    Scale shape (replaces round 8's three partition-less
    ``ntile(5).over(Window.orderBy(...))`` — a single-task global
    sort per metric at 10⁸-10⁹ users): ONE events scan → one
    user-keyed aggregate, then ONE exact ``percentile`` aggregate
    produces all twelve quintile boundaries in a single row —
    recency is scored on last-event time DIRECTLY (same ordering as
    days-since-last, no corpus-max join needed), so the plan has
    exactly one 1-row broadcast and zero Window nodes (both pinned
    by tests/test_plan_shapes.py). ``percentile``'s state is a
    value→count map per metric: last_epoch's domain is bounded by
    the corpus time window in seconds (independent of user count),
    freq is a small-domain count, monetary is floored to whole
    units. Scoring is tie-STABLE — equal metric values always land
    in the same quintile (boundary comparison), where ntile split
    ties by an arbitrary user_id tiebreak. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share the type-7 (N-1)·q linear
    interpolation, so the oracle replays the boundaries bitwise."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.max(F.unix_timestamp("ts")).alias("last_epoch"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("monetary"),
    )
    metrics = per_user.select(
        "user_id",
        "last_epoch",
        "freq",
        F.floor(F.col("monetary")).cast("bigint").alias("mon_u"),
    )
    qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    bounds = metrics.agg(
        F.expr(f"percentile(last_epoch, {qs})").alias("rb"),
        F.expr(f"percentile(freq, {qs})").alias("fb"),
        F.expr(f"percentile(mon_u, {qs})").alias("mb"),
    )

    def _bucket(col: str, b: str):
        v = F.col(col).cast("double")
        return (
            F.lit(1)
            + F.when(v > F.col(b)[0], 1).otherwise(0)
            + F.when(v > F.col(b)[1], 1).otherwise(0)
            + F.when(v > F.col(b)[2], 1).otherwise(0)
            + F.when(v > F.col(b)[3], 1).otherwise(0)
        )

    scored = metrics.join(F.broadcast(bounds)).select(
        "user_id",
        # recency: later last_epoch = more recent = better, so the
        # ascending epoch bucket IS the r_score (5 = most recent)
        _bucket("last_epoch", "rb").alias("r_score"),
        _bucket("freq", "fb").alias("f_score"),
        _bucket("mon_u", "mb").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


# ------------------------------------------------- TPC-H 22/22 (round 10)
# The fixture lacks a partsupp table, so the last five TPC-H shapes
# (Q2/Q9/Q11/Q16/Q20) derive one DETERMINISTICALLY from part ×
# supplier with pinned integer formulas — every column is pure
# integer arithmetic over the 0-based keys, so Spark and DuckDB
# derive bit-identical rows by construction (the q_media_decode
# closed-form-fixture precedent, no parquet write needed):
#   ps_suppkey    = (p_partkey + i·⌊S/4⌋) mod S,  i ∈ {0,1,2,3}
#                   (4 distinct suppliers per part for S ≥ 8)
#   ps_availqty   = (p_partkey·7  + ps_suppkey·11) mod 9999 + 1
#   ps_supplycost = (p_partkey·31 + ps_suppkey·17) mod 900  + 1
# ps_supplycost is INTEGER DOLLARS (1..900) so money math involving
# it stays exact in BIGINT/DECIMAL on both engines with no
# DOUBLE→DECIMAL rounding path anywhere.

def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table (see block comment above). Shape:
    4 rows per part, built by two broadcast cross joins (a 1-row
    supplier count and a 4-row index) — partsupp inherits part's
    partitioning with ZERO shuffles, so at 100 TB it stays a narrow
    map over the part scan."""
    part = load_table(spark, "part", sf_dir).select("p_partkey")
    scnt = load_table(spark, "supplier", sf_dir).agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    sk = (
        F.col("p_partkey")
        + F.col("i") * F.floor(F.col("s_cnt") / F.lit(4))
    ) % F.col("s_cnt")
    return (
        part.crossJoin(F.broadcast(scnt))
        # the 4-way fanout is a GENERATOR (explode), not a join —
        # one narrow Generate node over the part scan, zero BNLJ
        .withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in range(4)]))
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            sk.alias("ps_suppkey"),
        )
        .withColumn(
            "ps_availqty",
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999 + 1,
        )
        .withColumn(
            "ps_supplycost",
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 900 + 1,
        )
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to the fixture
    schema (p_type is a single word, so the size filter alone scopes
    parts; no s_address/s_phone/s_comment columns): for size-15
    parts, the EUROPE supplier(s) achieving the region-minimum
    supply cost. The correlated-MIN-subquery shape decorrelated the
    scale-safe way: aggregate the region-scoped partsupp to per-part
    minima once, then join back on (partkey, cost = min) — both
    sides share the ps_partkey shuffle key, and all dimension hops
    (supplier, nation, region) are broadcasts. Total ORDER BY
    (acctbal DESC, nation, supplier, partkey) + LIMIT 100, exactly
    the spec's presentation order."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_size") == 15
    ).select("p_partkey", "p_brand")
    eu = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    # rename the group key before the self-join: mn derives FROM eu,
    # and joining on same-lineage columns risks a trivially-true
    # predicate (Spark's self-join ambiguity)
    mn = (
        eu.groupBy(F.col("ps_partkey").alias("mk"))
        .agg(F.min("ps_supplycost").alias("min_cost"))
    )
    return (
        eu.join(
            mn,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), the hardest join tree in the
    suite: lineitem ⋈ orders ⋈ partsupp ⋈ part ⋈ supplier ⋈ nation,
    profit = disc revenue − supply cost, by nation and order year.
    Scale shape: part is filtered by name FIRST and joined into the
    derived partsupp (both narrow), and that small composite
    broadcasts into the lineitem scan — the only real shuffle left
    is lineitem ⋈ orders on orderkey. Money math: revenue in
    DECIMAL(18,4) exactly as the green Q1/Q3 rows; the supply-cost
    term is integer dollars × integral quantity, exact in BIGINT
    before the decimal subtraction — no float path anywhere."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, "nation", sf_dir)
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(part), F.col("ps_partkey") == part.p_partkey
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    one = F.lit(1).cast("decimal(18,2)")
    revenue = (_dec("l_extendedprice") * (one - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    cost = (
        F.col("ps_supplycost") * F.col("l_quantity").cast("long")
    ).cast("decimal(18,4)")
    return (
        li.join(
            F.broadcast(ps),
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(revenue - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): per-part stock
    value (supplycost × availqty) for EUROPE suppliers, keeping
    parts whose value exceeds 1.2× the average part share — the
    HAVING-over-global-aggregate shape. The global total is a 1-row
    broadcast (the q_psi_drift pattern), and the threshold is the
    exact integer cross-multiplication sum·np·10 > total·12 — all
    BIGINT, no float boundary. One shuffle: the groupBy(ps_partkey)
    aggregate; dimension hops broadcast."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "EUROPE"
    )
    scoped = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    tot = scoped.agg(
        F.sum("v").alias("total_v"),
        F.countDistinct("ps_partkey").alias("np"),
    )
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v").alias("sum_v"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("sum_v") * F.col("np") * 10 > F.col("total_v") * 12)
        .select(
            "ps_partkey",
            F.col("sum_v").cast("double").alias("value_dollars"),
        )
        .orderBy(F.col("value_dollars").desc(), "ps_partkey")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted to the
    fixture schema (no s_comment — "complaint" suppliers become the
    negative-balance ones): distinct supplier count per (brand,
    type, size) over six sizes, excluding one brand and the bad
    suppliers. The NOT-IN-subquery shape compiles to a LEFT ANTI
    join against the tiny bad-supplier list (broadcast); the
    countDistinct shuffles once on the grouping key."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 15, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), the nested semi-join
    chain: suppliers in three nations holding excess stock
    (availqty > half of what they shipped in 1997) of 'small%'
    parts. Ship quantities aggregate once per (partkey, suppkey) —
    integral doubles cast to BIGINT exactly — and the excess test is
    the integer cross-multiplication 2·availqty > qty. The supplier
    qualification is a LEFT SEMI join, so each supplier emits at
    most once regardless of how many parts qualify."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("qty")
    )
    small = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(small), F.col("ps_partkey") == small.p_partkey
    )
    qualifying = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
    )
    supp = load_table(spark, "supplier", sf_dir)
    nat = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(
            qualifying,
            supp.s_suppkey == qualifying.ps_suppkey,
            "left_semi",
        )
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


def q_stream_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming STORAGE hop, cross-engine graded (round 10,
    VERDICT r9 Next #7): three deterministic event batches commit
    into a versioned table (each commit also mirrored to the spec
    ``_delta_log``), a REAL ``readStream`` over the ``versionedcdf``
    Python DataSource replays them (engine-managed offsets = table
    versions; every added data file is one input partition read by
    executors), and ``exactly_once_versioned_sink`` lands each
    micro-batch downstream under a Delta txn action. The drain runs
    TWICE against the same checkpoint — the second pass must add
    nothing (restart-replay exactly-once), which the oracle enforces
    by construction: any duplicate row breaks the per-batch counts.
    The graded output aggregates the DOWNSTREAM table per
    (_change_version, event_type), so the values prove the replay
    covered every upstream commit exactly once."""
    import tempfile

    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )
    from etl_deltalake_spark.sources.versioned import versioned_table
    from etl_deltalake_spark.streaming.pipeline import (
        exactly_once_versioned_sink,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    root = tempfile.mkdtemp(prefix="sgraft_cdf_")
    src = versioned_table(spark, f"{root}/src", use_delta=False)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).alias("cents"),
    )
    for v in range(3):
        src.write(
            ev.filter(F.col("event_id") % 3 == v),
            timestamp=f"2026-01-{v + 1:02d}T00:00:00",
        )
    dst = versioned_table(spark, f"{root}/dst", use_delta=False)
    sink = exactly_once_versioned_sink(dst, "hop")

    def drain() -> None:
        q = (
            spark.readStream.format("versionedcdf")
            .option("path", src.path)
            .load()
            .withColumnRenamed("_change_version", "batch_v")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    drain()  # restart replay — engine offsets make it a no-op
    return (
        dst.read()
        .groupBy("batch_v", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("batch_v", "event_type")
    )


def q_sdp_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference medallion declared through the REAL Spark 4.1
    Declarative Pipelines API (round 10, etl_deltalake_spark/sdp.py):
    ``@dp.table`` bronze → ``@dp.materialized_view`` silver →
    ``@dp.materialized_view`` gold, registered GOLD-FIRST so the
    local runner's fixpoint dependency resolution (not declaration
    order) sequences the run, each layer materialized to physical
    parquet. Gold is exactly q_gold_window's diff/cumsum shape, so
    the same bitwise DuckDB oracle grades the whole declarative
    path: registry → resolution → three materializations → final
    rows."""
    import tempfile
    import uuid as _uuid

    from pyspark import pipelines as dp

    from etl_deltalake_spark.operators.window_agg import gold_aggregation
    from etl_deltalake_spark.sdp import run_pipeline

    p = f"sdp{_uuid.uuid4().hex[:8]}"

    def define() -> None:
        @dp.materialized_view(name=f"{p}_gold")
        def gold():  # declared first, resolved last
            s = spark.read.table(f"{p}_silver")
            return gold_aggregation(
                s,
                group_col="l_orderkey",
                diff_cols=["l_extendedprice", "l_quantity"],
                cumsum_cols=["l_quantity"],
                order_cols=[
                    "l_shipdate",
                    "l_linenumber",
                    "l_quantity",
                    "l_extendedprice",
                ],
            )

        @dp.materialized_view(name=f"{p}_silver")
        def silver():
            return spark.read.table(f"{p}_bronze").select(
                "l_orderkey",
                "l_linenumber",
                "l_shipdate",
                "l_quantity",
                "l_extendedprice",
            )

        @dp.table(name=f"{p}_bronze")
        def bronze():
            return load_table(spark, "lineitem", sf_dir)

    out = run_pipeline(
        spark, define, tempfile.mkdtemp(prefix="sgraft_sdp_")
    )
    return out[f"{p}_gold"].select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_quantity",
        "l_extendedprice",
        F.col("diff_l_extendedprice").alias("diff_extendedprice"),
        F.col("diff_l_quantity").alias("diff_quantity"),
        F.col("cumsum_l_quantity").alias("cumsum_quantity"),
    )


def q_incr_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (round 10,
    similarity.incremental_semantic_dedup) — the embedding-tier
    mirror of q_incr_neardup: the even-vec_id half plays the
    persisted KEPT-vector store (frozen cluster assignments), the
    odd half arrives as the new batch; a new vector drops iff it
    sits within tau of a store vector in its cluster or of a
    smaller-id batch vector. The DuckDB oracle re-derives the
    assignment argmax for both halves and replays both candidate
    joins and the min-dup rule exactly. tau=0.3 sits inside the
    synthetic fixture's similarity range (the q_semantic_dedup
    note); production runs ~0.95+."""
    from etl_deltalake_spark.operators.similarity import (
        incremental_semantic_dedup,
        ivf_assign_df,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = _ivf_centroids(spark, sf_dir)
    store = ivf_assign_df(
        emb.filter(F.col("vec_id") % 2 == 0),
        "vec_id",
        "embedding",
        cents,
    ).select("vec_id", "cluster_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    verdicts, _store2 = incremental_semantic_dedup(
        batch, "vec_id", "embedding", cents, store=store, tau=0.3
    )
    return verdicts.orderBy("vec_id")


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via the ALTERNATING large-star/small-star
    algorithm (round 10, dedup.alternating_components — Kiveris et
    al. SoCC'14), driver-gradable: a deterministic multi-hop graph
    over documents (chain edges i→i+1 within each decade of doc_id,
    plus skip edges i→i+5 for the first half of each decade) whose
    components are exactly the decades. The 10-hop chains force real
    multi-round contraction — a propagation bug, a lost edge, or a
    wrong min all break the closed-form cluster the oracle computes
    per node. Output: (doc, cluster, n_members) per node, cluster =
    min doc_id of the decade present in the table."""
    from etl_deltalake_spark.operators.dedup import alternating_components

    ids = load_table(spark, "documents", sf_dir).select("doc_id")
    chain = ids.filter(F.col("doc_id") % 10 != 9).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1).alias("doc_b"),
    )
    skip = ids.filter(F.col("doc_id") % 10 < 5).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 5).alias("doc_b"),
    )
    comp = alternating_components(chain.unionByName(skip))
    sizes = comp.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        comp.join(sizes, "cluster")
        .select("doc", "cluster", "n_members")
        .orderBy("doc")
    )


def q_dv_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read storage DML, cross-engine graded (round 11):
    the documents table commits into a versioned table, a
    deletion-vector DELETE masks every fifth doc and a
    deletion-vector UPDATE rewrites every seventh SURVIVOR (one
    commit: masks + rewritten rows — sources/versioned.py
    delete_where/update_where(use_dv=True)) without rewriting any
    committed data file; ``table_changes`` then derives the
    change-typed CDF (Delta readChangeFeed semantics) from the log's
    mask DELTAS. The graded aggregate per (_commit_version,
    _change_type) breaks if a mask misses a row, a masked row leaks
    back, the update's pre/post images diverge, or the mask delta
    double-counts the already-deleted docs — the oracle recomputes
    every change set from the source table. Reference analogue:
    DeltaTable DML over the stored table (main.py:465-470), done the
    modern merge-on-read way."""
    import tempfile

    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_dvcdf_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", (F.col("doc_id") % 1000).alias("bucket")
    )
    t.write(docs, timestamp="2026-01-01T00:00:00")  # v1
    t.delete_where(
        F.col("doc_id") % 5 == 0,
        timestamp="2026-01-02T00:00:00",
        use_dv=True,
    )  # v2
    t.update_where(
        F.col("doc_id") % 7 == 0,
        {"bucket": F.lit(-1).cast("long")},
        timestamp="2026-01-03T00:00:00",
        use_dv=True,
    )  # v3
    ch = t.table_changes(1)
    return (
        ch.groupBy("_commit_version", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("bucket").alias("sum_bucket"),
        )
        .orderBy("_commit_version", "_change_type")
    )


def q_rename_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage DDL without data rewrite, cross-engine graded (round
    11): customer commits into a versioned table, ALTER TABLE RENAME
    COLUMN (c_mktsegment → segment) and DROP COLUMN (c_name) run
    as metadata-only commits (sources/versioned.py column mapping —
    files keep their physical names; the Delta mirror emits the spec
    columnMapping form), an append AFTER the rename lands under the
    physical name, and a merge-on-read DELETE keys on the RENAMED
    column. The graded aggregate breaks if the mapping misroutes a
    column, the post-rename append lands under the wrong physical
    name, or the dropped column leaks. Oracle: the same rename/drop
    applied relationally to the source table."""
    import tempfile

    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_rename_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).alias("cents"),
        "c_name",
    )
    t.write(
        cust.filter(F.col("c_custkey") % 2 == 0),
        timestamp="2026-01-01T00:00:00",
    )
    t.rename_column("c_mktsegment", "segment", "2026-01-02T00:00:00")
    t.drop_column("c_name", "2026-01-02T12:00:00")
    t.write(
        cust.filter(F.col("c_custkey") % 2 == 1)
        .withColumnRenamed("c_mktsegment", "segment")
        .drop("c_name"),
        mode="append",
        timestamp="2026-01-03T00:00:00",
    )
    t.delete_where(
        F.col("segment") == "BUILDING",
        timestamp="2026-01-04T00:00:00",
        use_dv=True,
    )
    return (
        t.read()
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("segment")
    )


def q_partitioned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned versioned table, cross-engine graded (round
    11): orders commit partitioned by o_orderpriority (the real Delta
    layout — partition values live in directory names and the log,
    never in the parquet), an append inherits the layout, a
    merge-on-read DELETE masks one priority, and the graded read
    aggregates per partition — pruning is plan-asserted by
    tests/test_plan_shapes.py-style checks in the storage tests; the
    oracle recomputes the same aggregate relationally. Breaks if
    partition values misroute (injection from dirs), the append lands
    in the wrong layout, or masked rows leak."""
    import tempfile

    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_part_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    t.write(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        mode="overwrite",
        timestamp="2026-01-01T00:00:00",
        partition_by=["o_orderpriority"],
    )
    t.write(
        orders.filter(F.col("o_orderkey") % 2 == 1),
        timestamp="2026-01-02T00:00:00",
    )
    t.delete_where(
        F.col("o_orderpriority") == "1-URGENT",
        timestamp="2026-01-03T00:00:00",
        use_dv=True,
    )
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


def q_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE, cross-engine graded (round 11): customer
    commits into a versioned table, then a source batch (every 7th
    customer with a changed segment and zeroed balance, plus synthetic
    new keys) merges via ``upsert(use_dv=True)`` — ONE commit that
    masks the matched rows with deletion vectors and appends the
    source; untouched files are never rewritten (sources/versioned.py
    upsert). The graded aggregate per segment breaks if a matched row
    survives unmasked, a source row is lost, or the masks leak onto
    non-matched rows. Oracle: the relational MERGE (anti-join + union)
    over the source table. Reference analogue: DeltaTable.merge
    (main.py:465-470), done the modern merge-on-read way."""
    import tempfile

    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_dvmerge_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).alias("cents"),
    )
    t.write(cust, timestamp="2026-01-01T00:00:00")
    n_cust = cust.count()
    updates = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MERGED").alias("c_mktsegment"),
        F.lit(0).cast("long").alias("cents"),
    )
    inserts = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") % 5 == 0)
        .select(
            (F.col("c_custkey") + F.lit(n_cust) * 10).alias("c_custkey"),
            F.lit("FRESH").alias("c_mktsegment"),
            F.lit(1).cast("long").alias("cents"),
        )
    )
    t.upsert(
        updates.unionByName(inserts), ["c_custkey"],
        timestamp="2026-01-02T00:00:00", use_dv=True,
    )
    return (
        t.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("c_mktsegment")
    )


def q_cdf_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec change-data-feed, cross-engine graded (round 12): a
    CDF-enabled versioned table (delta.enableChangeDataFeed) takes an
    initial load, a merge-on-read DELETE, and a merge-on-read UPDATE;
    each DML commit writes its change rows under ``_change_data/``
    and logs spec ``cdc`` actions. The graded frame is read by
    ``delta_log.read_delta_cdf`` — the SPEC reader over the Delta log
    alone, never the custom log — so it breaks if the cdc actions,
    the change files, or the insert-derivation for the plain append
    commit are wrong. Oracle: the same change feed derived
    relationally from the source table. Scale: CDF read cost is
    O(change rows), not O(touched files) — the reason the spec
    records changes instead of deriving them."""
    import tempfile

    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_cdfspec_")
    t = versioned_table(spark, f"{root}/t", use_delta=False, cdf=True)
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).alias("cents"),
    )
    t.write(cust, timestamp="2026-01-01T00:00:00")
    t.delete_where(
        F.col("c_mktsegment") == "BUILDING",
        timestamp="2026-01-02T00:00:00",
        use_dv=True,
    )
    t.update_where(
        F.col("c_custkey") % 10 == 3,
        {"cents": F.col("cents") + 1},
        timestamp="2026-01-03T00:00:00",
        use_dv=True,
    )
    # plain INSERT OVERWRITE writes NO cdc actions — the reader must
    # DERIVE it as removes-as-delete (DV masks applied: only live
    # rows) + adds-as-insert, delta-spark's CDCReader rule (round 13)
    t.write(
        cust.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey",
            F.lit("NEW").alias("c_mktsegment"),
            F.lit(5).cast("long").alias("cents"),
        ),
        mode="overwrite",
        timestamp="2026-01-04T00:00:00",
    )
    ch = DL.read_delta_cdf(spark, t.path, -1)
    return (
        ch.groupBy("_change_type", "_commit_version")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("_change_type", "_commit_version")
    )


def q_clone_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE, cross-engine graded (round 12): customer loads
    into a versioned table, a merge-on-read DELETE masks one segment,
    ``delta_log.shallow_clone`` snapshots the table as a NEW spec
    table of absolute-path adds (deletion vectors rewritten to
    absolute ``p`` storage), and the SOURCE then deletes another
    segment. The graded aggregate reads the CLONE through the spec
    reader — it breaks if the absolute adds mispoint, the DV rewrite
    fails (MACHINERY resurrects), or source evolution leaks in
    (BUILDING disappears). Oracle: the clone-time snapshot derived
    relationally. Scale: the clone is ONE metadata commit at any
    table size — the O(metadata) dev/test-copy story."""
    import tempfile

    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_clone_")
    t = versioned_table(spark, f"{root}/src", use_delta=False)
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).alias("cents"),
    )
    t.write(cust, timestamp="2026-01-01T00:00:00")
    t.delete_where(
        F.col("c_mktsegment") == "MACHINERY",
        timestamp="2026-01-02T00:00:00",
        use_dv=True,
    )
    DL.shallow_clone(
        spark, t.path, f"{root}/clone", timestamp="2026-01-03T00:00:00"
    )
    # post-clone source evolution must NOT leak into the clone
    t.delete_where(
        F.col("c_mktsegment") == "BUILDING",
        timestamp="2026-01-04T00:00:00",
        use_dv=True,
    )
    return (
        DL.read_delta(spark, f"{root}/clone")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("c_mktsegment")
    )


def q_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-stats file skipping on the READ PATH, cross-engine graded
    (round 13, VERDICT r12 #4): orders commit as four key-ranged
    appends (disjoint per-file min/max in the mirrored log's stats),
    a merge-on-read DELETE masks every 10th key, and the graded read
    goes through the SPEC reader with ``ranges`` — files whose stats
    exclude [lo, hi] are pruned from the scan before any footer is
    opened (tests/test_stats_pruning.py proves strictly-fewer files;
    this row grades bit-equality). Breaks if pruning drops a file it
    must keep, a masked row survives in a kept file, or the range
    arithmetic diverges. Scale: a point query over 100 TB should
    open O(matching files) footers, not O(all files)."""
    import tempfile

    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_prune_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("cents"),
    )
    mk = orders.agg(F.max("o_orderkey")).collect()[0][0]
    for i in range(4):
        lo_i = i * (mk + 1) // 4
        hi_i = (i + 1) * (mk + 1) // 4
        t.write(
            orders.filter(
                (F.col("o_orderkey") >= lo_i)
                & (F.col("o_orderkey") < hi_i)
            ),
            mode="overwrite" if i == 0 else "append",
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    t.delete_where(
        F.col("o_orderkey") % 10 == 7,
        timestamp="2026-01-05T00:00:00",
        use_dv=True,
    )
    lo, hi = mk // 3, 2 * mk // 3
    return (
        # the one-argument predicate-pushdown form: Catalyst mines the
        # prune bounds from the SQL text AND the filter applies —
        # grading ranges_from_condition + file skipping + row filter
        DL.read_delta(
            spark, t.path,
            where=f"o_orderkey BETWEEN {lo} AND {hi}",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("o_orderpriority")
    )


def q_purge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG TABLE ... APPLY (PURGE), cross-engine graded (round 14,
    VERDICT r13 #1): part commits as four key-ranged appends into a
    CDF-enabled table, a merge-on-read DELETE masks every 10th key
    and a merge-on-read UPDATE rewrites every (key % 10 == 6)
    survivor behind deletion vectors, then ``purge()`` materializes
    the masks — rewriting ONLY the masked files, dataChange=false.
    The graded frame composes (a) the post-purge snapshot through the
    SPEC reader, (b) proof of CDF SILENCE — the change feed at the
    purge's commit version must be empty, folded in as a graded
    column — and (c) the purged snapshot carrying ZERO deletion
    vectors. Breaks if purge loses a live row, resurrects a masked
    one, drops the update's rewrite, emits change rows, or leaves a
    mask behind. Oracle: the post-purge snapshot derived
    relationally, with literal-zero silence columns. Scale: purge is
    O(masked files), not O(table) — the right-to-be-forgotten pass
    over 100 TB rewrites only the 0.1% of files its masks touch."""
    import tempfile

    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_purge_")
    t = versioned_table(spark, f"{root}/t", use_delta=False, cdf=True)
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey",
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + 0.5).alias("cents"),
    )
    mk = part.agg(F.max("p_partkey")).collect()[0][0]
    for i in range(4):
        lo_i = i * (mk + 1) // 4
        hi_i = (i + 1) * (mk + 1) // 4
        t.write(
            part.filter(
                (F.col("p_partkey") >= lo_i)
                & (F.col("p_partkey") < hi_i)
            ),
            mode="overwrite" if i == 0 else "append",
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    t.delete_where(
        F.col("p_partkey") % 10 == 3,
        timestamp="2026-01-05T00:00:00",
        use_dv=True,
    )
    t.update_where(
        F.col("p_partkey") % 10 == 6,
        {"cents": F.col("cents") + 7},
        timestamp="2026-01-06T00:00:00",
        use_dv=True,
    )
    purged = t.purge(timestamp="2026-01-07T00:00:00")
    assert purged > 0, "DV DML above must leave masked files to purge"
    snap = DL.delta_snapshot(spark, t.path)
    v_purge = snap["version"]
    dvs_after = sum(
        1 for a in snap["adds"] if a.get("deletionVector")
    )
    # dataChange=false ⇒ the spec CDF reader must see NOTHING at the
    # purge version (incremental consumers stay silent)
    cdf_after = (
        DL.read_delta_cdf(spark, t.path, -1)
        .filter(F.col("_commit_version") >= v_purge)
        .count()
    )
    return (
        DL.read_delta(spark, t.path)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p_partkey").alias("sum_key"),
            F.sum("cents").alias("sum_cents"),
        )
        .withColumn(
            "cdf_after_purge", F.lit(int(cdf_after)).cast("long")
        )
        .withColumn(
            "dvs_after_purge", F.lit(int(dvs_after)).cast("long")
        )
        .orderBy("p_brand")
    )


def q_identity_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTITY allocation graded cross-engine (round 14, slotless
    pytest gate): supplier splits into even keys (initial load) and
    odd keys (append), each written as ONE sorted partition into a
    table whose ``uid`` is GENERATED ALWAYS AS IDENTITY (START 1000
    STEP 7). The allocator assigns ``watermark + step·(1..n)`` in
    partition-row order — for a single sorted partition that is
    exactly key-rank order, so the DuckDB oracle re-derives every
    allocated value with ``row_number()`` and the append's values
    continue above the first write's watermark. Graded through the
    SPEC reader. Breaks if allocation skips/repeats a value, the
    watermark does not advance commit-to-commit, or the mirrored log
    loses the column."""
    import tempfile

    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table

    root = tempfile.mkdtemp(prefix="sgraft_ident_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    t.set_identity_column("uid", start=1000, step=7)
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    t.write(
        sup.filter(F.col("s_suppkey") % 2 == 0)
        .repartition(1)
        .sortWithinPartitions("s_suppkey"),
        timestamp="2026-01-01T00:00:00",
    )
    t.write(
        sup.filter(F.col("s_suppkey") % 2 == 1)
        .repartition(1)
        .sortWithinPartitions("s_suppkey"),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    return (
        DL.read_delta(spark, t.path)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("uid").alias("sum_uid"),
            F.sum("s_suppkey").alias("sum_key"),
            F.min("uid").alias("min_uid"),
            F.max("uid").alias("max_uid"),
        )
        .orderBy("s_nationkey")
    )
