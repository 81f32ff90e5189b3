"""Deterministic Bloom-filter semi-join reduction — the runtime-
filter pattern (Spark's own AQE injects these as
InSubqueryExec/bloom runtime filters; this operator makes the
technique explicit, portable, and cross-engine verifiable).

Use case at 100 TB: a fact scan joined to a selective dimension
subset. A plain semi-join shuffles the whole fact table's keys; a
Bloom pre-filter drops most non-matching rows INSIDE the fact scan
(map-side, no shuffle) so only candidates reach the join. The filter
is a superset test: it never drops a true match (no false
negatives), and surviving false positives are eliminated by the
exact join that follows.

Everything is deterministic md5 arithmetic — no JVM hash seeds — so
the DuckDB oracle rebuilds the IDENTICAL filter bit-for-bit and the
whole reduction is graded cross-engine (q_bloom_join), unlike
Spark's built-in ``BloomFilterAggregate`` whose serialized sketch is
engine-private.

Layout: ``n_words`` 32-bit words stored in longs (bit index < 32
keeps every shift far from the sign bit in both engines);
``n_hashes`` positions per key from independent md5 streams
(``"{h}:{key}"``). Build = explode the positions (n_hashes rows per
BUILD-side key — dimension-sized) → ``bit_or`` per word; the
collected filter is n_words longs (KBs — codebook-sized driver
traffic, the ivf_topk contract). Probe = n_hashes pure column
expressions against the literal word array: scan-side, zero
shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _positions(key: Column, n_hashes: int, n_bits: int) -> list[Column]:
    """md5-derived bit positions, one per hash stream — exactly
    reproducible in any engine with md5 + integer ops."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{h}:"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits),
        )
        for h in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, n_words: int = 256, n_hashes: int = 4
) -> list[int]:
    """Build the filter over the (small) build side: returns the
    dense word array, zeros included — position w of the list IS
    word w, so the probe indexes it as a literal array."""
    n_bits = n_words * WORD_BITS
    pos = df.select(
        F.explode(
            F.array(*_positions(F.col(key_col), n_hashes, n_bits))
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / WORD_BITS).cast("long").alias("w"),
            # F.shiftleft's numBits wrapper is int-only; the SQL
            # function takes an expression
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("p"), F.lit(WORD_BITS)).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[int(r["w"])] = int(r["mask"])
    return dense


def bloom_might_contain(
    key: Column, words: list[int], n_hashes: int = 4
) -> Column:
    """Scan-side membership test against a built filter: true for
    every build-side key (no false negatives), false for most
    others. Pure column expressions over the literal word array."""
    n_bits = len(words) * WORD_BITS
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for p in _positions(key, n_hashes, n_bits):
        word = F.element_at(arr, ((p / WORD_BITS).cast("int") + F.lit(1)))
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            F.pmod(p, F.lit(WORD_BITS)).cast("int"),
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_words: int = 256,
    n_hashes: int = 4,
) -> DataFrame:
    """Semi-join ``fact`` to ``dim`` with a Bloom pre-filter: the
    scan-side test drops most non-matching fact rows before the
    exact (broadcast) semi-join removes the false positives. Result
    is EXACTLY the plain semi-join — the filter only changes how
    much data survives the scan."""
    words = bloom_build(dim, dim_key, n_words, n_hashes)
    pre = fact.filter(
        bloom_might_contain(F.col(fact_key), words, n_hashes)
    )
    return pre.join(
        F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
        fact_key,
        "left_semi",
    )
