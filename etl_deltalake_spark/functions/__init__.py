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
 - multimodal: frame_offsets
"""

from etl_deltalake_spark.operators.cleaning import format_decimal_str
from etl_deltalake_spark.operators.dedup import shingles
from etl_deltalake_spark.operators.multimodal import frame_offsets
from etl_deltalake_spark.operators.pii import mask_email, synth_email
from etl_deltalake_spark.operators.similarity import (
    cosine,
    dot,
    hyperplane_bits,
    norm,
    unit_vec,
)
from etl_deltalake_spark.operators.text import (
    fingerprint_md5,
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
    "cosine",
    "dot",
    "fingerprint_md5",
    "format_decimal_str",
    "frame_offsets",
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
]
