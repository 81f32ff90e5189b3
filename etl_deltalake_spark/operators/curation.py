"""Corpus-curation signals and gates beyond dedup: repetition
quality signals, eval-set decontamination, and per-source quota
sampling.

The reference has no corpus surface at all (it is a ticker ETL;
SURVEY §2.9 mandates the training-data extensions); these are the
three curation steps a large-scale pipeline runs between dedup and
packing:

 - ``repetition_stats``: Gopher-style repetition signals (Rae et
   al., "Scaling Language Models: Methods, Analysis & Insights from
   Training Gopher", 2021, §A1.1 repetition filters) — documents
   dominated by repeated words/n-grams are boilerplate or spam and
   get filtered on these fractions.
 - ``contamination_report`` / ``decontaminate``: n-gram-overlap
   decontamination against a benchmark/eval set (the GPT-3 paper's
   13-gram overlap method, Brown et al. 2020 §C, at corpus scale) —
   training docs that substantially overlap an eval document leak
   the benchmark.
 - ``quota_sample``: deterministic per-source document caps — the
   mixing-weights guard that stops one crawl dump from dominating a
   blend (cf. The Pile's per-set epochs, Gao et al. 2020 §2).

Scale shapes:
 - repetition_stats: word frequencies shuffle (doc, word) pairs once,
   then reduce per doc; the n-gram ratios are pure scan-side array
   expressions (no explode, no shuffle).
 - contamination: the BENCH side is tiny by construction (an eval
   set); its distinct shingle set broadcasts, so the corpus side
   never shuffles — one scan + per-doc aggregation. The corpus is
   never joined against itself.
 - quota_sample: one hash-partitioned window per group; the sort key
   is md5(id) so the sample is deterministic, uniform within a
   source, and reproducible across engines (no sampleBy/RNG seed
   drift).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.text import normalize_text


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(text_col), " ").alias("words"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals on the normalized text:

      n_words            token count
      dup_word_frac      1 - distinct_words / words
      dup_2gram_frac     1 - distinct_2grams / 2grams
      top_word_frac      occurrences of the most frequent word / words

    The two dup fractions are scan-side array expressions (the word
    array is aliased once and attribute-bound, same CollapseProject
    rule as dedup.shingle_rows); only top_word_frac needs word
    frequencies — a (doc, word) groupBy whose shuffle carries tokens,
    not documents, then a per-doc max. Filters like
    ``dup_word_frac > 0.9`` are the standard boilerplate gate.
    """
    w = _words(df, id_col, text_col)
    wcol = F.col("words")
    g2 = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(wcol) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(wcol, i + 1, 2)),
    )
    scan = w.select(
        "doc",
        F.size(wcol).cast("bigint").alias("n_words"),
        F.round(
            1 - F.size(F.array_distinct(wcol)) / F.size(wcol), 6
        ).alias("dup_word_frac"),
        F.round(1 - F.size(F.array_distinct(g2)) / F.size(g2), 6).alias(
            "dup_2gram_frac"
        ),
    )
    freq = (
        w.select("doc", F.explode(wcol).alias("word"))
        .groupBy("doc", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc")
        .agg(F.max("cnt").alias("_top"))
    )
    return scan.join(freq, "doc").select(
        "doc",
        "n_words",
        "dup_word_frac",
        "dup_2gram_frac",
        F.round(F.col("_top") / F.col("n_words"), 6).alias("top_word_frac"),
    )


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Distinct word k-gram rows, k parameterized (dedup.shingle_rows
    pins k at call sites; decontamination conventionally uses longer
    grams — 13 in GPT-3 — to avoid chance collisions)."""
    w = _words(df, id_col, text_col)
    wcol = F.col("words")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(wcol) - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(wcol, i + 1, k)),
        )
    )
    return w.select("doc", F.explode(grams).alias("gram"))


def contamination_report(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Corpus documents whose k-gram shingle sets overlap a benchmark
    set above ``threshold``: (doc, n_shingles, n_hit, overlap_frac).

    ``bench`` is the eval corpus (same id/text columns). Its DISTINCT
    gram set is eval-set-sized → broadcast; the corpus side is one
    scan + one per-doc reduction, never self-joined. overlap_frac is
    |doc_grams ∩ bench_grams| / |doc_grams| — the doc-side containment
    (a tiny eval doc fully inside a training doc must still flag).
    """
    bench_grams = _doc_shingles(bench, id_col, text_col, k).select(
        "gram"
    ).distinct()
    sh = _doc_shingles(df, id_col, text_col, k)
    hits = (
        sh.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, "doc", "left")
        .select(
            "doc",
            "n_shingles",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_shingles"), 6
            ).alias("overlap_frac"),
        )
        .filter(F.col("overlap_frac") >= threshold)
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.2,
) -> DataFrame:
    """Drop the documents ``contamination_report`` flags; returns the
    cleaned corpus with the input's columns (anti-join on the id —
    ids and grams shuffle, full rows never do)."""
    flagged = contamination_report(
        df, bench, id_col, text_col, k, threshold
    ).select(F.col("doc").alias(id_col))
    return df.join(flagged, on=id_col, how="left_anti")


def quota_sample(
    df: DataFrame, group_col: str, id_col: str, quota: int
) -> DataFrame:
    """Keep at most ``quota`` rows per group, chosen deterministically
    by md5(id) order (ties broken by the id itself): a reproducible
    uniform-within-group sample with no RNG, so two engines — or two
    runs over re-partitioned data — select identical rows. One
    hash-partitioned window per group; no driver participation."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def quota_sample_two_phase(
    df: DataFrame, group_col: str, id_col: str, quota: int
) -> DataFrame:
    """``quota_sample`` for groups that dwarf a partition: a
    per-partition pre-cap bounds what the exact window ever sees.

    Phase 1 (``mapInPandas``, zero shuffle): within each input
    partition, keep only the ``quota`` smallest rows per group by the
    SAME (md5(id), id) key the window uses — an Arrow-batched
    streaming top-k that carries at most quota rows per (group,
    partition) across batches. Phase 2 is the unchanged exact window.
    Because the global quota winners are each the winners of their own
    partition, the pre-cap provably never drops a row the window would
    keep — output is IDENTICAL to the single-phase form (for unique,
    non-null ids, the same determinism contract as ``quota_sample``).

    Scale: the window's shuffle input drops from the full group (a
    crawl source can be 10⁹ rows) to quota × n_partitions rows per
    group. The md5 here is Python-side (hashlib) but equals Spark's
    ``md5(cast(id as string))`` for int/string ids, so both phases
    rank identically.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    schema = df.schema
    if group_col not in schema.names or id_col not in schema.names:
        raise ValueError(
            f"columns {group_col!r}/{id_col!r} not in {schema.names}"
        )

    def precap(batches):
        import hashlib

        import pandas as pd

        kept: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keyed = pdf.assign(
                _k=pdf[id_col]
                .astype(str)
                .map(lambda s: hashlib.md5(s.encode()).hexdigest())
            )
            for g, sub in keyed.groupby(group_col, sort=False, dropna=False):
                prev = kept.get(g)
                cur = (
                    sub
                    if prev is None
                    else pd.concat([prev, sub], ignore_index=True)
                )
                kept[g] = cur.sort_values(
                    ["_k", id_col], kind="mergesort"
                ).head(quota)
        for cur in kept.values():
            yield cur.drop(columns=["_k"])

    pre = df.mapInPandas(precap, schema=schema)
    return quota_sample(pre, group_col, id_col, quota)


def negative_samples(
    df: DataFrame, id_col: str, k: int = 4, seed: str = "neg"
) -> DataFrame:
    """Deterministic pseudo-random negative sampling — the
    contrastive-training counterpart of ``hash_split``: for every
    anchor row, ``k`` negatives drawn by hashing (seed, id, j) into
    the id space. No RNG, so two engines — or a re-run over
    re-partitioned data — draw identical negatives, and a given
    anchor's negatives never change as the pipeline is re-executed.

    Output: (id, j, neg_id) with j in 0..k-1 and neg_id != id
    (a draw that hits its own anchor shifts to the next id mod N).

    Requires DENSE ids 0..N-1 (validated with one scalar aggregate —
    raises otherwise): then the draw IS the negative id and the whole
    operator is a scan-side explode, zero joins, zero shuffles. For
    sparse ids, assign a dense index first (row_number at small
    scale; zipWithIndex-style per-partition offsets at 100 TB) and
    map back — the hash-draw core is identical.

    N ships as a folded literal (one scalar collect, same
    codebook-only-collect contract as similarity.ivf_topk).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ).collect()[0]
    n = int(stats["n"])
    if n == 0:
        raise ValueError("negative_samples: empty input")
    if n < 2:
        raise ValueError("negative_samples: need >= 2 ids to draw negatives")
    if int(stats["nd"]) != n or int(stats["lo"]) != 0 or int(stats["hi"]) != n - 1:
        raise ValueError(
            f"negative_samples requires dense ids 0..N-1; got "
            f"n={n} distinct={stats['nd']} min={stats['lo']} max={stats['hi']}"
        )
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    keyed = df.select(F.col(id_col), j)
    raw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col(id_col).cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % n
    )
    neg = F.when(raw == F.col(id_col), (raw + 1) % n).otherwise(raw)
    return keyed.select(
        F.col(id_col), F.col("j").cast("bigint").alias("j"), neg.alias("neg_id")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by the
    md5 of its id — deterministic, engine-reproducible, and stable
    under re-partitioning or incremental growth (a doc's split never
    changes when new docs arrive, unlike fraction-of-position
    schemes). Adds a ``split`` column.

    ``fractions`` must sum to 1 (±1e-9). Boundaries are cumulative
    fractions of the 32-hex-digit md5 space; the comparison is plain
    string ordering on the full digest against literal hex cutoffs,
    so any engine with md5 reproduces the exact assignment. Scan-side
    expression — zero shuffles, no RNG seed to drift.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"fractions must be non-negative: {fractions}")
    # Zero-fraction splits can never receive a row — drop them before
    # building cutoffs (a trailing zero split would otherwise push a
    # cumulative fraction to 1.0, whose cutoff overflows 12 hex digits
    # and corrupts the string comparison). Cutoffs are additionally
    # clamped below 16^12 against float-rounding at the top end.
    names = [n for n, f in fractions.items() if f > 0]
    if not names:
        raise ValueError("at least one fraction must be positive")
    cuts = []
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        cut = min(int(acc * 16**12), 16**12 - 1)
        cuts.append(f"{cut:012x}" + "0" * 20)
    # A NULL id cannot be hashed — it would silently fall through to
    # the last split (md5(NULL) is NULL, every comparison NULL); fail
    # loudly row-side instead.
    h = F.when(
        F.col(id_col).isNotNull(), F.md5(F.col(id_col).cast("string"))
    ).otherwise(
        F.raise_error(F.lit(f"hash_split: NULL {id_col} cannot be assigned"))
    )
    expr = F.lit(names[-1])
    for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
        expr = F.when(h < cut, F.lit(name)).otherwise(expr)
    # nested whens evaluate smallest cutoff first via the fold above
    return df.withColumn("split", expr)


def stratified_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """EXACT stratified splitting: within every stratum, splits get
    floor-exact proportional shares (a stratum of 100 rows at
    weights {train:8, val:1, test:1} yields exactly 80/10/10 —
    ``hash_split`` only converges to fractions in expectation, which
    on small or skewed strata over/under-fills splits).

    Mechanics: rows order within their stratum by (md5(id), id) — a
    deterministic total order uncorrelated with the data — then the
    stratum's rank range maps onto the splits at cumulative-weight
    cutoffs: row rn goes to the first split k with
    rn·Σw ≤ n_stratum·cumw_k (integer arithmetic, no floats). Each
    split's count is exactly the floor of its share, so deviation
    from the ideal fraction is < 1 row per split per stratum.
    Deterministic and engine-reproducible; unlike hash_split the
    assignment is NOT stable under incremental growth (adding rows
    re-ranks), so use this for frozen evaluation sets and hash_split
    for growing corpora — complementary contracts.

    Scale: ONE window shuffle on the strata key (rank and the
    stratum count share the same window partitioning — one sort, two
    frames, no second exchange). The cutoff mapping is a literal
    when-chain over small integer weights.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive ints: {weights}")
    total = sum(weights.values())
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    wn = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w)
    n_stratum = F.count(F.lit(1)).over(wn)
    expr = None
    acc = 0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = rn * total <= n_stratum * acc
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def corpus_divergence(
    df: DataFrame,
    side_col,
    text_col: str,
    top_k: int = 15,
    scale: int = 6,
) -> DataFrame:
    """Distribution drift between two corpus slices: per-term
    contributions to KL(P‖Q) where P is the unigram distribution of
    the ``side_col``-true slice and Q of the false slice, both
    add-one smoothed over the JOINT vocabulary — the domain-shift /
    contamination-drift detector (which terms make corpus A unlike
    corpus B).

    Output: the ``top_k`` terms by KL contribution
    (word, c_a, c_b, kl_contrib), ordered (contrib DESC, word).
    Contributions are P·ln(P/Q) rounded to ``scale`` — pure scalar
    double arithmetic on exact integer counts, so cross-engine
    bitwise.

    Scale shape: ONE pass over the exploded words with conditional
    count aggregation (no per-side scans, no join of two count
    tables); corpus totals (N_a, N_b, |V|) are a single-row
    broadcast cross join (the q_bm25 pattern). Shuffle carries
    (word, counts) only.
    """
    from etl_deltalake_spark.operators.text import word_tokens

    side = F.col(side_col) if isinstance(side_col, str) else side_col
    # a NULL side belongs to neither slice — dropping it here keeps
    # the joint vocabulary honest (a word seen only on NULL-side rows
    # must not get a spurious smoothed KL contribution)
    words = df.filter(side.isNotNull()).select(
        side.alias("_a"),
        F.explode(word_tokens(text_col)).alias("word"),
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count(F.when(F.col("_a"), 1)).alias("c_a"),
        F.count(F.when(~F.col("_a"), 1)).alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("_na"),
        F.sum("c_b").alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p = (F.col("c_a") + 1).cast("double") / (F.col("_na") + F.col("_v"))
    q = (F.col("c_b") + 1).cast("double") / (F.col("_nb") + F.col("_v"))
    contrib = F.round(p * F.log(p / q), scale)
    return (
        j.select("word", "c_a", "c_b", contrib.alias("kl_contrib"))
        .orderBy(F.desc("kl_contrib"), "word")
        .limit(top_k)
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col, n: int, scale: int = 9
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, public algorithm): each row gets
    priority −ln(u)/w with u a uniform derived from md5(id) — the
    n smallest priorities are exactly a weight-proportional sample
    without replacement. Replacing the RNG with the hash-derived
    uniform makes the draw reproducible across reruns, retries, and
    ENGINES: u = (first 13 md5 hex digits as a 52-bit integer + 1)
    / 2^52, identical in Spark (conv base-16) and DuckDB (hex-digit
    fold — q_weighted_draw's oracle). The priority is ROUNDed to
    ``scale`` so sub-rounding libm ln() ULP differences can never
    flip an ordering; remaining ties break by id.

    One scan + one top-n: ``orderBy(...).limit(n)`` plans
    TakeOrderedAndProject DIRECTLY (per-partition heap + driver
    merge of n) — no full sort, no single-partition window, at any
    scale. Weight column must be strictly positive.
    Output: the sampled rows + their priority.
    """
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u_int = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("double")
    u = (u_int + 1.0) / F.lit(float(1 << 52))
    pri = F.round(-F.log(u) / wcol.cast("double"), scale)
    return (
        df.withColumn("priority", pri)
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(n)
    )


def shard_assign(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Assign every row a training shard and a deterministic
    shuffle key — the export layout step of a training-data
    pipeline (dataloaders read N equal-ish shards in a
    pseudo-random document order).

    Adds ``shard`` (long in [0, n_shards)) and ``shuffle_key`` (the
    full md5 hex digest). The key is md5("{seed}:{id}") so a new
    seed is a brand-new global permutation while one seed is stable
    under re-partitioning, retries, and incremental growth; the
    shard is the first 8 hex digits as an integer mod ``n_shards``
    (md5 uniformity ⇒ shard sizes concentrate within O(sqrt) of
    n/n_shards — balance is graded, not assumed). Scan-side
    expressions only — the shuffle happens once, in
    ``write_shards``, keyed on the 8-hex prefix int, and any engine
    with md5 reproduces the exact assignment (q_train_shards'
    DuckDB oracle re-derives both columns).

    No counterpart in the reference (eager single-process pandas,
    main.py:1-638); north-star extension per SURVEY §2.9.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.when(
        F.col(id_col).isNotNull(),
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))),
    ).otherwise(
        F.raise_error(F.lit(f"shard_assign: NULL {id_col} cannot be sharded"))
    )
    return df.withColumn("shuffle_key", h).withColumn(
        "shard",
        F.conv(F.substring(F.col("shuffle_key"), 1, 8), 16, 10)
        .cast("long")
        % n_shards,
    )


def shard_manifest(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Per-row shard + position: where each document lands in the
    exported training order. ``pos`` is the row's 1-based rank
    within its shard under the shuffle-key order (ties — 2^-64
    md5-prefix collisions — break by id, so the order is total and
    engine-reproducible).

    One hash-partitioned window (shuffle on ``shard``, the same
    partitioning ``write_shards`` uses — at 100 TB the manifest and
    the export share one exchange); no global sort anywhere.
    """
    w = Window.partitionBy("shard").orderBy("shuffle_key", F.col(id_col))
    return (
        shard_assign(df, id_col, n_shards, seed)
        .withColumn("pos", F.row_number().over(w))
    )


def write_shards(
    df,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Export the corpus as ``n_shards`` deterministically shuffled
    parquet shards: directory-partitioned by ``shard``, rows inside
    each shard sorted by the shuffle key. ONE shuffle (repartition
    on shard) + in-partition sort — a global pseudo-random training
    order with no global sort; rereading shard files in filename
    order replays the exact ``shard_manifest`` order.
    """
    (
        shard_assign(df, id_col, n_shards, seed)
        .repartition(n_shards, "shard")
        # shard leads the sort so the partitioned writer's required
        # ordering (partition columns first) is ALREADY satisfied —
        # otherwise FileFormatWriter inserts its own non-stable sort
        # on shard and scrambles the shuffle-key order
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def blocklist_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: DataFrame,
    term_col: str = "term",
    max_hits: int = 0,
) -> DataFrame:
    """Multi-term blocklist audit (round 8) — the safety-filter tier
    of the curation funnel (decontamination guards eval overlap; this
    guards curated TERM lists: slurs, PII markers, spam vocabulary):
    tokenize each document under THE shared token definition, count
    occurrences of blocklisted terms, and keep a document iff its
    total hits stay within ``max_hits``.

    Shape: explode tokens → equi-join against the BROADCAST term
    table (blocklists are curated and small — thousands of rows;
    the corpus-side stream never shuffles for the join) → one
    per-doc aggregate → left join back so zero-hit documents are
    KEPT, not dropped by the inner join. Occurrence counts (not
    just distinct terms) so one slur repeated 50 times scores 50.

    Output: (id, n_hits, n_terms, kept) — one row per input doc.
    """
    from etl_deltalake_spark.operators.text import tokens

    toks = df.select(
        F.col(id_col).alias("_bid"),
        F.explode(tokens(text_col)).alias("_tok"),
    )
    hits = (
        toks.join(
            F.broadcast(terms.select(F.col(term_col).alias("_tok"))),
            "_tok",
        )
        .groupBy("_bid")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("_tok").alias("n_terms"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_bid"))
        .join(hits, "_bid", "left")
        .select(
            F.col("_bid").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce(F.col("n_terms"), F.lit(0)).cast("bigint").alias("n_terms"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) <= max_hits).alias("kept"),
        )
    )
