"""Public column-expression library — the engine's scalar/array
function surface in one import (the counterpart of
``pyspark.sql.functions`` for the domain-specific operators this
engine adds; everything composes with stock ``F.*``).

The reference has no function registry — its scalar surface is the
handful of pandas string/number ops in SURVEY §2.3-2.4; this module
is the engine-level generalization the driver's oracle exercises.

Grouped by family:
 - text:       tokens, token_count, word_count, stopword_ratio,
               punct_ratio, quality_score, lang_id, normalize_text,
               fingerprint_md5, script_counts, script_id,
               nfc_text
 - dedup:      shingles (expression form; prefer the table-valued
               operators in operators.dedup for hot paths)
 - similarity: dot, norm, cosine, unit_vec, hyperplane_bits
 - pii:        synth_email, mask_email
 - cleaning:   format_decimal_str
 - multimodal: frame_offsets, hamming64
 - crawl:      html_to_text, canonical_url, zlib_ratio (round 8 —
               the crawl→corpus column surface)
 - adversarial: fold_confusables (round 8 — lookalike-codepoint
               folding for evasion-resistant dedup)
"""

from etl_deltalake_spark.operators.cleaning import format_decimal_str
from etl_deltalake_spark.operators.crawl import zlib_ratio
from etl_deltalake_spark.operators.dedup import shingles
from etl_deltalake_spark.operators.html_text import html_to_text
from etl_deltalake_spark.operators.multimodal import frame_offsets, hamming64
from etl_deltalake_spark.operators.pii import mask_email, synth_email
from etl_deltalake_spark.operators.urls import canonical_url
from etl_deltalake_spark.operators.similarity import (
    cosine,
    dot,
    hyperplane_bits,
    norm,
    unit_vec,
)
from etl_deltalake_spark.operators.text import (
    fingerprint_md5,
    fold_confusables,
    lang_id,
    nfc_text,
    normalize_text,
    punct_ratio,
    quality_score,
    script_counts,
    script_id,
    stopword_ratio,
    token_count,
    tokens,
    word_count,
)

__all__ = [
    "canonical_url",
    "cosine",
    "dot",
    "fingerprint_md5",
    "fold_confusables",
    "format_decimal_str",
    "frame_offsets",
    "hamming64",
    "html_to_text",
    "hyperplane_bits",
    "lang_id",
    "mask_email",
    "nfc_text",
    "normalize_text",
    "norm",
    "punct_ratio",
    "quality_score",
    "script_counts",
    "script_id",
    "shingles",
    "stopword_ratio",
    "synth_email",
    "token_count",
    "tokens",
    "unit_vec",
    "word_count",
    "zlib_ratio",
]
