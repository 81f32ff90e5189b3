"""Multilingual text-normalization gate (round-5, VERDICT Wrong #1).

The pre-round-5 `normalize_text` was ASCII-only: every non-Latin
document normalized to (near-)empty, so the whole dedup family
collapsed a multilingual corpus into one fingerprint. These tests pin
the Unicode behavior with a mixed zh/ru/es/ar/el/hi/vi/ko fixture and
grade Spark against an independent DuckDB oracle using the SAME
Unicode classes (plans/oracles._NORM / _TOKEN_PAT):

1. non-identical docs in ANY script get DISTINCT fingerprints;
2. exact duplicates still collapse (per-script duplicate pairs);
3. Spark's normalized text / token arrays match DuckDB byte-for-byte;
4. exact_dedup_stats output matches the oracle SQL on this corpus.

Round 6: Turkish İ is no longer excluded — normalize_text folds
İ→i BEFORE lower() (mirrored in oracles._NORM), closing the one
engine divergence (JVM full-folds İ→i+U+0307, DuckDB simple-folds
İ→i); tr fixtures now ride the byte-exact gate like every other
script.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.dedup import exact_dedup_stats, shingle_rows
from etl_deltalake_spark.operators.text import normalize_text, tokens
from etl_deltalake_spark.plans.oracles import _NORM, _TOKEN_PAT

# (doc_id, text) — one unique doc per script plus an exact duplicate
# pair per script (ids 100+ duplicate ids 1..8 verbatim).
ML_DOCS = [
    (1, "Hello, WORLD! This is plain English text no. 123."),
    (2, "Привет, мир — это первый русский документ №42."),
    (3, "你好，世界。这是一段中文文本，用于测试！"),
    (4, "¡Hola, señor! ¿Cómo está? Café y niño añejo."),
    (5, "مرحبا بالعالم، هذه وثيقة عربية رقم 456."),
    (6, "Ελληνικά κείμενο· αυτή είναι μια δοκιμή."),
    (7, "हिन्दी में यह एक परीक्षण पाठ है, संख्या १२३।"),
    (8, "Tiếng Việt có dấu: đây là văn bản thử nghiệm."),
    (9, "한국어 텍스트입니다. 중복 제거 테스트!"),
    (10, "日本語のテキストです。２０２５年のテスト！"),
    # second distinct doc per heavy script — must NOT collide
    (11, "你好，世界。这是另一段不同的中文文本。"),
    (12, "Привет, мир — это ВТОРОЙ русский документ."),
    # Turkish, with the İ/ı casefold hazards in play (round 6):
    # İstanbul carries U+0130, ırmak the dotless ı (U+0131)
    (13, "İstanbul'da büyük bir ırmak var; ĞÜŞİÖÇ harfleri test."),
    (14, "İzmir ve İstanbul iki farklı şehirdir, değil mi?"),
    # exact duplicates (same content, new ids) — MUST collide
    (101, "Hello, WORLD! This is plain English text no. 123."),
    (103, "你好，世界。这是一段中文文本，用于测试！"),
    (102, "Привет, мир — это первый русский документ №42."),
    (105, "مرحبا بالعالم، هذه وثيقة عربية رقم 456."),
    (113, "İstanbul'da büyük bir ırmak var; ĞÜŞİÖÇ harfleri test."),
]


@pytest.fixture(scope="module")
def ml_spark(spark):
    return spark.createDataFrame(ML_DOCS, ["doc_id", "text"])


@pytest.fixture(scope="module")
def ml_duck():
    con = duckdb.connect()
    ml_df = pd.DataFrame(ML_DOCS, columns=["doc_id", "text"])
    con.register("ml_pandas", ml_df)
    con.execute("CREATE VIEW documents AS SELECT * FROM ml_pandas")
    yield con
    con.close()


def test_normalized_text_matches_oracle_bytewise(ml_spark, ml_duck):
    s = {
        r["doc_id"]: r["norm"]
        for r in ml_spark.select(
            "doc_id", normalize_text("text").alias("norm")
        ).collect()
    }
    d = dict(
        ml_duck.execute(f"SELECT doc_id, {_NORM} FROM documents").fetchall()
    )
    assert s == d
    # sanity: nothing normalized to empty (the ASCII-only failure mode)
    assert all(len(v) > 0 for v in s.values())


def test_tokens_match_oracle(ml_spark, ml_duck):
    s = {
        r["doc_id"]: list(r["t"])
        for r in ml_spark.select("doc_id", tokens("text").alias("t")).collect()
    }
    d = dict(
        ml_duck.execute(
            f"SELECT doc_id, regexp_extract_all(lower(text), {_TOKEN_PAT})"
            " FROM documents"
        ).fetchall()
    )
    assert s == {k: list(v) for k, v in d.items()}
    # zh docs tokenize into word runs, not per-char punctuation soup
    assert any(len(t) >= 2 for i, t in s.items() if i == 3)


def test_exact_dedup_no_cross_script_collisions(ml_spark):
    out = exact_dedup_stats(ml_spark, "doc_id", "text").collect()
    # 14 distinct contents (ids 1..14); 5 of them duplicated once
    assert len(out) == 14
    by_canon = {r["canonical_id"]: r["n_copies"] for r in out}
    dups = {1, 2, 3, 5, 13}
    assert {i for i, n in by_canon.items() if n == 2} == dups
    assert all(n == 1 for i, n in by_canon.items() if i not in dups)


def test_exact_dedup_matches_oracle(ml_spark, ml_duck):
    s_rows = sorted(
        (r["fp"], r["canonical_id"], r["n_copies"])
        for r in exact_dedup_stats(ml_spark, "doc_id", "text").collect()
    )
    d_rows = sorted(
        ml_duck.execute(
            f"""
            SELECT md5({_NORM}) AS fp,
                   MIN(doc_id) AS canonical_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY 1
            """
        ).fetchall()
    )
    assert s_rows == d_rows


def test_script_id_matches_oracle_on_mixed_corpus(ml_spark, ml_duck):
    """script_counts/script_id vs the DuckDB mirror on the mixed
    corpus — and sanity: each doc routes to its actual script."""
    from etl_deltalake_spark.operators.text import script_id
    from etl_deltalake_spark.plans.oracles import _script_id_sql, _script_n, _SCRIPTS

    s = dict(
        (r["doc_id"], r["script"])
        for r in ml_spark.select(
            "doc_id", script_id("text").alias("script")
        ).collect()
    )
    inner = ", ".join(f"{_script_n(sc)} AS n_{sc.lower()}" for sc in _SCRIPTS)
    d = dict(
        ml_duck.execute(
            f"SELECT doc_id, {_script_id_sql()} FROM "
            f"(SELECT doc_id, text, {inner} FROM documents)"
        ).fetchall()
    )
    assert s == d
    want = {
        1: "Latin", 2: "Cyrillic", 3: "Han", 4: "Latin", 5: "Arabic",
        6: "Greek", 7: "Devanagari", 8: "Latin", 9: "Hangul",
        11: "Han", 12: "Cyrillic",
    }
    for doc, script in want.items():
        assert s[doc] == script, f"doc {doc}: got {s[doc]}, want {script}"


def test_shingles_nonempty_for_cjk(ml_spark):
    # CJK has no spaces — shingle_rows must still emit ≥1 gram per doc
    sh = shingle_rows(ml_spark, "doc_id", "text", k=3)
    counts = {
        r["doc"]: r["n"]
        for r in sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == {d for d, _ in ML_DOCS}
    assert all(n >= 1 for n in counts.values())


def test_nfc_unifies_composed_and_decomposed(spark):
    """NFC composition: café (NFC) and café (NFD) must share a dedup
    fingerprint after nfc_text, and Spark's unicodedata kernel must
    match DuckDB's nfc_normalize byte-for-byte."""
    import duckdb
    import pandas as pd

    from etl_deltalake_spark.operators.text import nfc_text, normalize_text

    rows = [
        (1, "café is nice"),                    # NFC
        (2, "café is nice"),                   # NFD — same text
        (3, "Tiếng Việt"),   # stacked marks
        (4, "각 decomposed jamo"),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["nfc"], r["fp"])
        for r in df.select(
            "doc_id",
            nfc_text("text").alias("nfc"),
            F.md5(normalize_text(nfc_text("text"))).alias("fp"),
        ).collect()
    }
    # composed == decomposed after NFC
    assert out[1][0] == out[2][0]
    assert out[1][1] == out[2][1]
    # without NFC they would differ
    raw = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", F.md5(normalize_text("text")).alias("fp")
        ).collect()
    }
    assert raw[1] != raw[2]
    # byte-exact vs DuckDB
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = dict(con.execute("SELECT doc_id, nfc_normalize(text) FROM t").fetchall())
    assert {k: v[0] for k, v in out.items()} == duck
    con.close()


def test_turkish_casefold_stable_across_engines(spark):
    """İ (U+0130) is the one Unicode char whose lowercase mapping is
    multi-char; the JVM full-folds it (İ→i+U+0307) while DuckDB
    simple-folds (İ→i). normalize_text's İ→i pre-pass must (a) agree
    byte-for-byte with the mirrored oracle and (b) give İSTANBUL /
    İstanbul / istanbul one shared fingerprint, while dotless ı
    stays distinct from i."""
    import duckdb

    rows = [
        (1, "İSTANBUL"),
        (2, "İstanbul"),
        (3, "istanbul"),
        (4, "ıstanbul"),  # dotless ı — a DIFFERENT Turkish word shape
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {
        r["doc_id"]: (r["norm"], r["fp"])
        for r in df.select(
            "doc_id",
            normalize_text("text").alias("norm"),
            F.md5(normalize_text("text")).alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        d = {
            i: (n, fp)
            for i, n, fp in con.execute(
                f"SELECT doc_id, {_NORM}, md5({_NORM}) FROM documents"
            ).fetchall()
        }
    finally:
        con.close()
    assert s == d
    assert s[1] == s[2] == s[3] == ("istanbul", s[3][1])
    assert s[4][0] == "ıstanbul" and s[4][1] != s[3][1]
