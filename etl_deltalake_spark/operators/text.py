"""Text-analysis operators for training-data pipelines (SURVEY §2.9).

All pure column expressions over ``documents.text`` — JVM-side,
vectorized, no Python UDFs. Each returns a Column so queries can
compose them; the SQL oracle mirrors each formula exactly.

At 100 TB these run embarrassingly parallel on the scan — no
shuffle; the only care is keeping regexes linear-time (no
backtracking constructs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-ish tokens or single punctuation — a BPE-ish pre-tokenizer
# split (public GPT-2-style regex simplified to RE2-safe form).
# Unicode classes (\p{L} letters, \p{M} combining marks, \p{N} digits)
# so non-Latin scripts tokenize as words instead of dissolving into
# per-char punctuation; identical semantics in Java regex and DuckDB
# RE2 (verified over zh/ru/ar/el/hi/vi/ko/tr fixtures — Turkish İ,
# formerly the one divergence, is closed by folded_lower's İ→i
# pre-pass, round 6).
TOKEN_PATTERN = r"[\p{L}\p{M}\p{N}_]+|[^\p{L}\p{M}\p{N}_\s]"

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# Marker stopwords per language for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "est"),
    "zh": ("de", "shi", "bu"),
}



def folded_lower(c) -> Column:
    """``lower()`` with the İ→i casefold pre-pass: U+0130 is the one
    Unicode char whose default lowercase mapping is multi-char
    (SpecialCasing.txt İ→i+U+0307) and the engines disagree on it
    (JVM full-folds, DuckDB simple-folds). Every text-column
    lowercase in this module routes through here, mirrored in the
    oracles as ``lower(replace(text, 'İ', 'i'))`` — one definition so
    the Spark/DuckDB pair can't drift, and Turkish İstanbul/istanbul
    share a canonical form."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.translate(col, "İ", "i"))


def word_tokens(text_col) -> Column:
    """Lowercased whitespace-split word array — THE tokenization
    contract shared by q_heavy_hitters, bpe.word_freqs, and
    curation.corpus_divergence (and mirrored by their DuckDB oracles
    as string_split_regex of the folded lower). One definition so
    the three can't drift; callers filter the '' artifacts."""
    return F.split(folded_lower(text_col), r"\s+")

def tokens(col: str) -> Column:
    """Tokenize: array of BPE-ish tokens (casefolded lower)."""
    return F.regexp_extract_all(folded_lower(col), F.lit(TOKEN_PATTERN), 0)


def token_count(col: str) -> Column:
    """Token count under the BPE-ish pre-tokenizer."""
    return F.size(tokens(col)).cast("bigint")


def word_count(col: str) -> Column:
    """Whitespace word count."""
    return F.size(F.split(F.trim(F.col(col)), r"\s+")).cast("bigint")


def stopword_ratio(col: str) -> Column:
    """Fraction of whitespace words that are stopwords (round 6)."""
    words = F.split(folded_lower(F.trim(F.col(col))), r"\s+")
    stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS))).cast("double")
    return F.round(stop / F.size(words), 6)


def punct_ratio(col: str) -> Column:
    """Punctuation chars / total chars (round 6); 0 for empty."""
    total = F.length(col).cast("double")
    punct = (
        total - F.length(F.regexp_replace(col, r"[^\p{L}\p{M}\p{N}_\s]", ""))
    ).cast("double")
    return F.when(total == 0, F.lit(0.0)).otherwise(F.round(punct / total, 6))


def quality_score(col: str) -> Column:
    """Composite quality heuristic in [0,1] (round 6).

    0.4·length-score + 0.4·(1−stopword-excess) + 0.2·(1−punct-ratio):
    a documented, deterministic stand-in for model-based quality
    scoring — the shape (bounded sub-scores, weighted sum) is what a
    real pipeline tunes.
    """
    len_score = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_pen = F.least(stopword_ratio(col) * 2.0, F.lit(1.0))
    return F.round(
        0.4 * len_score + 0.4 * (1.0 - stop_pen) + 0.2 * (1.0 - punct_ratio(col)), 6
    )


def _isin_filter(markers: tuple[str, ...]):
    # Closure factory: a default-arg lambda would grow a second
    # parameter that PySpark's higher-order-function binding treats
    # as a lambda variable (Column), not a Python value.
    return lambda w: w.isin(*markers)


def lang_scores(col: str) -> dict[str, Column]:
    """Per-language marker-word hit counts (the n-gram heuristic)."""
    words = F.split(folded_lower(F.trim(F.col(col))), r"\s+")
    return {
        lang: F.size(F.filter(words, _isin_filter(markers))).cast("bigint")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: str) -> Column:
    """Predicted language: argmax of marker counts, ties broken by
    fixed precedence (de, en, es, fr, zh) — deterministic and
    SQL-mirrorable as a CASE chain."""
    s = lang_scores(col)
    ordered = sorted(LANG_MARKERS)  # de, en, es, fr, zh
    best = s[ordered[0]]
    for lang in ordered[1:]:
        best = F.greatest(best, s[lang])
    expr = F.lit(ordered[-1])
    for lang in reversed(ordered[:-1]):
        expr = F.when(s[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


# Unicode scripts for character-level identification. Java regex
# (\p{IsHan}) and DuckDB RE2 (\p{Han}) agree character-for-character
# on these (verified across mixed-script fixtures).
SCRIPTS = (
    "Arabic",
    "Cyrillic",
    "Devanagari",
    "Greek",
    "Han",
    "Hangul",
    "Hiragana",
    "Katakana",
    "Latin",
)


def script_counts(col: str) -> dict[str, Column]:
    """Per-script character counts — the robust FIRST stage of
    language identification for a multilingual corpus: marker-word
    heuristics (``lang_id``) only work within Latin script, while
    script membership is a property of the code point itself. One
    linear regex pass per script, scan-side, no shuffle."""
    return {
        sc: F.length(
            F.regexp_replace(F.col(col), rf"[^\p{{Is{sc}}}]", "")
        ).cast("bigint")
        for sc in SCRIPTS
    }


def script_id(col: str) -> Column:
    """Dominant Unicode script of the text: argmax of per-script
    character counts, ties broken by fixed alphabetical precedence
    (the ``lang_id`` convention), ``'unknown'`` when no counted
    script appears (digits/punctuation-only). Mixed CJK text (Han +
    kana) resolves to its dominant script — script ID is the routing
    stage; per-language disambiguation runs downstream on the
    script's subset."""
    counts = script_counts(col)
    best = None
    for sc in SCRIPTS:
        best = counts[sc] if best is None else F.greatest(best, counts[sc])
    expr = F.lit("unknown")
    for sc in reversed(SCRIPTS):
        expr = F.when(
            (counts[sc] == best) & (best > 0), F.lit(sc)
        ).otherwise(expr)
    return expr


def sentence_spans_py(text: str) -> list[tuple[int, int, str]]:
    """THE sentence-split definition (round 8: shared by the
    sentence_spans UDTF and packing.sentence_chunks so span
    extraction and chunking can't drift): simple deterministic
    ., !, ? terminators; returns (start, end, stripped_sentence)
    triples, empty segments dropped, an unterminated tail kept.
    Lives here (not udfs.py) because executors import this module
    inside Arrow kernels — udfs.py carries module-level pandas_udf
    decorators that need an active session."""
    out: list[tuple[int, int, str]] = []
    start = 0
    n = len(text)
    for i, ch in enumerate(text):
        if ch in ".!?":
            seg = text[start : i + 1].strip()
            if seg:
                out.append((start, i + 1, seg))
            start = i + 1
    tail = text[start:].strip()
    if tail:
        out.append((start, n, tail))
    return out


def nfc_text(col) -> Column:
    """Unicode NFC canonical composition — the normalization stage
    BEFORE fingerprinting that makes composed ("café", U+00E9) and
    decomposed ("café", e + U+0301) spellings of the same text
    collide in dedup; without it every NFD-producing source (macOS
    filenames, some OCR/keyboards) silently escapes exact dedup.

    Spark has no built-in Unicode normalizer, so this is an
    Arrow-batched pandas UDF over stdlib ``unicodedata`` — both it
    and DuckDB's ``nfc_normalize`` implement the Unicode standard
    and agree byte-for-byte (verified over NFD Latin, stacked
    Vietnamese marks, decomposed Hangul jamo, non-canonically
    ordered marks; tests/test_multilingual.py). Scan-side, no
    shuffle; compose as ``normalize_text(nfc_text("text"))``."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    def _nfc(texts):
        return texts.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None
            else None
        )

    f = pandas_udf(_nfc, "string")
    return f(F.col(col) if isinstance(col, str) else col)


def normalize_text(col) -> Column:
    """Canonical form: lowercase, strip punctuation, collapse spaces.
    Accepts a column name or a Column (compose with ``nfc_text``).

    Unicode-aware: keeps any letter (\\p{L}), combining mark (\\p{M} —
    Devanagari matras, Vietnamese NFD accents) and digit (\\p{N}), so
    Chinese/Cyrillic/Arabic/accented-Latin documents keep distinct
    normal forms instead of collapsing to (near-)empty — the ASCII-only
    form silently collided every non-Latin document into one dedup
    fingerprint. Same classes in DuckDB RE2 (oracles._NORM).

    Turkish İ (U+0130) gets a casefold-normalizing pre-pass: it is
    the ONE Unicode character whose default lowercase mapping is
    multi-char (SpecialCasing.txt: İ → i + U+0307), and the engines
    disagree on it (JVM full-folds, DuckDB simple-folds to plain i).
    Mapping İ→i BEFORE lower() — mirrored in oracles._NORM — makes
    the canonical form engine-stable, and is also what a Turkish
    dedup wants: İstanbul and istanbul share a fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c, "İ", "i")
    cleaned = F.regexp_replace(F.lower(folded), r"[^\p{L}\p{M}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def fingerprint_md5(col: str) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_table(df, id_col: str, text_col: str, k: int = 5):
    """Row-level md5 fingerprint + min-shingle (winnowing-style)
    fingerprint via the codegen'd exploded-shingle path — the
    production form of ``fingerprint_md5``+``shingle_fingerprint``
    (one shuffle on the doc id; see operators/dedup.shingle_rows).
    Output: doc, fp, shingle_fp."""
    from pyspark.sql import functions as F  # local: avoid shadowing

    from etl_deltalake_spark.operators.dedup import shingle_rows

    sh = shingle_rows(df, id_col, text_col, k)
    mins = sh.groupBy("doc").agg(F.min(F.md5("gram")).alias("shingle_fp"))
    fps = df.select(
        F.col(id_col).alias("doc"), fingerprint_md5(text_col).alias("fp")
    )
    return fps.join(mins, "doc")


def tfidf_table(df, id_col: str, text_col: str, top_k: int = 3):
    """TF-IDF scores, top-k terms per document (SURVEY §2.9 text
    analysis; smooth idf = ln((1+N)/(1+df)) + 1, sklearn-style).

    Pure DataFrame ops (no MLlib — HashingTF's murmur buckets are
    engine-specific and not oracle-reproducible): explode tokens →
    per-(doc,term) counts → document frequency → join + score →
    ranked window. Shuffles: (doc,term) agg, term agg, the df join
    (broadcast when the vocabulary is small), final window on doc.
    N (corpus size) is computed once driver-side — one tiny count
    job, the standard pattern for global scalars in iterative/scored
    pipelines.

    Output: doc, term, tfidf, rn (1..top_k).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc").distinct().count()
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + 1.0
    scored = tf.join(dfreq, "term").select(
        "doc", "term", F.round(F.col("tf") * idf, 6).alias("tfidf")
    )
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_k)
    )


def bigram_lm_scores(df, id_col: str, text_col: str):
    """Corpus bigram language-model quality score per document — the
    relational form of the KenLM-style LM filter a curation pipeline
    runs (score docs by how probable their token sequences are under
    a model trained on the corpus itself; outlier-low scores flag
    boilerplate/garbage).

    Model: add-one-smoothed bigram MLE over the corpus,
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); per-doc score is the
    mean log-probability over its bigrams.

    Execution shape: posexplode tokens scan-side → bigram via a lead
    window (ONE shuffle on doc id) → two count aggregations (bigram,
    unigram — shuffles on the n-gram keys, map-side partial) → join
    scores back (the n-gram count tables are Zipf-small relative to
    the corpus; Spark broadcasts them when they fit) → one final
    groupBy on doc. V and the corpus size are single-row aggregates
    cross-joined in — no driver-side collect.

    Determinism across engines: the per-doc mean is computed as an
    exact DECIMAL(20,10) sum of per-bigram log-probs divided by the
    bigram count — order-independent, so the DuckDB oracle matches
    bitwise after the final ROUND(.., 6).

    Output: doc, n_bigrams, lm_score.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    big = (
        tok.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc", F.col("term").alias("w1"), F.col("nxt").alias("w2"))
    )
    c_uni = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c_uni"))
    c_big = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    vocab = tok.agg(F.countDistinct("term").alias("v"))
    logp = F.log(
        (F.col("c_big") + 1.0) / (F.col("c_uni") + F.col("v"))
    ).cast("decimal(20,10)")
    return (
        big.join(c_big, ["w1", "w2"])
        .join(c_uni, F.col("w1") == F.col("term"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).alias("lm_score"),
        )
    )


def bigram_lm_transfer_scores(
    train_df, score_df, id_col: str, text_col: str
):
    """Score one corpus under a bigram LM trained on ANOTHER — the
    real curation form of ``bigram_lm_scores``: production pipelines
    score candidate data against a model fit on a trusted reference
    corpus (KenLM-on-Wikipedia-style filtering), not on the candidate
    set itself.

    Model: add-one-smoothed bigram MLE from ``train_df``;
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V) with V = train vocabulary
    size. Unseen bigrams fall back to the +1 numerator; unseen w1
    contributes log(1/V·…) via COALESCE(c_uni, 0) — out-of-domain
    text scores low, which is exactly the filter signal.

    Execution shape mirrors ``bigram_lm_scores`` (one window shuffle
    per corpus for bigram assembly, Zipf-small count tables joined
    back — broadcast when they fit, 1-row V cross join); per-doc
    means use the DECIMAL(20,10) exact-sum so the DuckDB oracle
    matches bitwise. Output: doc, n_bigrams, lm_score.
    """
    from pyspark.sql import Window

    def _bigrams(df):
        tok = df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(tokens(text_col)).alias("pos", "term"),
        )
        w = Window.partitionBy("doc").orderBy("pos")
        big = (
            tok.withColumn("nxt", F.lead("term").over(w))
            .filter(F.col("nxt").isNotNull())
            .select("doc", F.col("term").alias("w1"), F.col("nxt").alias("w2"))
        )
        return tok, big

    t_tok, t_big = _bigrams(train_df)
    c_uni = t_tok.groupBy(F.col("term").alias("w1")).agg(
        F.count(F.lit(1)).alias("c_uni")
    )
    c_big = t_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    vocab = t_tok.agg(F.countDistinct("term").alias("v"))

    _, s_big = _bigrams(score_df)
    logp = F.log(
        (F.coalesce(F.col("c_big"), F.lit(0)) + 1.0)
        / (F.coalesce(F.col("c_uni"), F.lit(0)) + F.col("v"))
    ).cast("decimal(20,10)")
    return (
        s_big.join(c_big, ["w1", "w2"], "left")
        .join(c_uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(logp).cast("double") / F.count(F.lit(1)), 6
            ).alias("lm_score"),
        )
    )


def shingle_fingerprint(col: str, k: int = 5) -> Column:
    """Winnowing-style fingerprint: min md5 over word k-gram shingles
    of the normalized text (a single representative hash; the full
    winnowing window is overkill for fixture-scale docs).
    Hot-path note: prefer ``fingerprint_table`` — the transform
    lambda here re-evaluates the normalize+split chain per shingle
    in the interpreted HOF path."""
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
    )
    return F.array_min(F.transform(shingles, F.md5))


# PII redaction lives in operators/pii.py (the dedicated compliance
# module); re-exported here for composition with the text pipeline.
from etl_deltalake_spark.operators.pii import (  # noqa: E402,F401
    PII_PATTERNS,
    pii_hits,
    redact_pii,
)


# Unicode confusables fold (round 8): a curated subset of the common
# Cyrillic/Greek → Latin lookalike pairs (the high-traffic rows of
# Unicode TR39's confusables data — the full table is out of scope;
# this subset covers the script-mixing substitutions that actually
# defeat exact-hash dedup). Each source char appears once; Greek and
# Cyrillic capitals are distinct codepoints even when both map to the
# same Latin letter. The oracle pins these exact strings.
CONFUSABLES_FROM = (
    "аеорсхуіѕј"  # Cyrillic lowercase lookalikes
    "АВЕКМНОРСТХУ"  # Cyrillic uppercase
    "ονΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"  # Greek
)
CONFUSABLES_TO = "aeopcxyisj" "ABEKMHOPCTXY" "ovABEZHIKMNOPTYX"


def fold_confusables(col: Column) -> Column:
    """Map lookalike Cyrillic/Greek codepoints onto their Latin
    targets — one JVM-side codepoint-wise ``translate``, zero Python.
    Adversarial-dedup tier: a duplicate that swaps Latin 'aeo' for
    Cyrillic 'аео' hashes differently under exact dedup and usually
    survives MinHash too (every shingle containing a swapped char
    changes); folding first restores the match. Compose BEFORE
    ``normalize_text`` (the fold is case-sensitive by design — capital
    lookalikes map to capitals)."""
    return F.translate(col, CONFUSABLES_FROM, CONFUSABLES_TO)


def nb_quality_scores(
    train_df,
    score_df,
    id_col: str,
    text_col: str,
    label,
):
    """Trained quality classifier — the CCNet/fastText pipeline
    pattern (train a cheap linear text classifier on a labeled
    reference, score candidate documents at corpus scale) as pure
    DataFrame algebra: multinomial Naive Bayes with add-one
    smoothing over the BPE-ish token stream (round 9, SURVEY §2.9
    text analysis).

    ``label`` is a boolean Column over ``train_df`` (self-supervised
    labels — e.g. a heuristic quality rule — or human labels alike).
    Per token t the model weight is the smoothed log-likelihood
    ratio w(t) = ln((c₁+1)/(n₁+V)) − ln((c₀+1)/(n₀+V)); a scored
    doc's margin is the class-prior log-odds plus Σ w over its token
    OCCURRENCES, with out-of-vocabulary tokens falling back to the
    constant w_oov = ln(1/(n₁+V)) − ln(1/(n₀+V)).

    Execution shape: one explode over each corpus; the model is a
    Zipf-small (term → weight) table joined back LEFT (broadcast
    when it fits); totals/prior/OOV ride ONE 1-row broadcast. Scale:
    nothing driver-side, one shuffle per aggregation, the scored
    corpus shuffles only (doc, term) pairs.

    Determinism across engines: every log is quantized to
    DECIMAL(20,10) before summing (the bigram-LM precedent —
    order-independent sums, bitwise-replayable in the DuckDB oracle
    after the final ROUND(.., 6)).

    Output: doc, n_terms, nb_margin (round 6), pred (margin > 0).
    """
    labeled = train_df.select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("_txt"),
        label.cast("int").alias("y"),
    )
    tok = labeled.select(
        "doc", "y", F.explode(tokens("_txt")).alias("term")
    )
    per_term = tok.groupBy("term").agg(
        F.sum("y").alias("c1"),
        F.sum(F.lit(1) - F.col("y")).alias("c0"),
    )
    # 1-row totals DERIVED FROM per_term (n1/n0 are its column sums,
    # V its row count) — no second scan of the token stream — plus
    # the cheap per-doc label counts; materialized eagerly because
    # both the model weights and the consts row consume it (without
    # the checkpoint the subtree would execute once per consumer)
    totals = (
        per_term.groupBy()
        .agg(
            F.sum("c1").alias("n1"),
            F.sum("c0").alias("n0"),
            F.count(F.lit(1)).alias("v"),
        )
        .crossJoin(
            labeled.groupBy().agg(
                F.sum("y").alias("d1"),
                F.sum(F.lit(1) - F.col("y")).alias("d0"),
            )
        )
        .localCheckpoint(eager=True)
    )
    dec = "decimal(20,10)"
    model = per_term.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.log((F.col("c1") + 1.0) / (F.col("n1") + F.col("v")))
            - F.log((F.col("c0") + 1.0) / (F.col("n0") + F.col("v")))
        )
        .cast(dec)
        .alias("w"),
    )
    consts = totals.select(
        (
            F.log(1.0 / (F.col("n1") + F.col("v")))
            - F.log(1.0 / (F.col("n0") + F.col("v")))
        )
        .cast(dec)
        .alias("w_oov"),
        (
            F.log((F.col("d1") + 1.0) / (F.col("d0") + 1.0))
        )
        .cast(dec)
        .alias("prior"),
    )
    stok = score_df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # prior/w_oov are 1-row constants broadcast onto every token row;
    # first(prior) inside the agg is deterministic (constant per group)
    margin = (
        F.first("prior")
        + F.sum(F.coalesce(F.col("w"), F.col("w_oov")))
    ).cast("double")
    return (
        stok.join(model, "term", "left")
        .crossJoin(F.broadcast(consts))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(margin, 6).alias("nb_margin"),
        )
        .select(
            "doc",
            "n_terms",
            "nb_margin",
            (F.col("nb_margin") > 0).alias("pred"),
        )
    )
