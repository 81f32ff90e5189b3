"""End-to-end corpus preparation: the composition a large-scale
training-data pipeline actually runs, built entirely from this
package's operators (quality scoring, language ID, exact dedup,
MinHash+LSH near-dup clustering).

The reference stops at per-table cleaning (SURVEY §2.4-2.5); this is
the §2.9 extension surface composed into one funnel:

    raw docs
      → quality floor        (column expressions, scan-side)
      → language allowlist   (column expressions, scan-side)
      → exact dedup          (one shuffle on a 32-char fingerprint)
      → near-dup keep-one    (LSH band join + label propagation;
                              never all-pairs)
      → cleaned corpus

Scale shape: the two filters prune BEFORE any shuffle (predicate
pushdown applies — they reference only the text column); exact dedup
shuffles fingerprints, not text; the near-dup stage runs on the
already-shrunk survivor set. Every stage is lazy — one pass end to
end when the result is written.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.dedup import (
    label_propagation_clusters,
    minhash_near_dup_pairs,
)
from etl_deltalake_spark.operators.text import (
    lang_id,
    normalize_text,
    quality_score,
)


def exact_dedup_keep_min(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the minimum-id row per distinct normalized text. The
    groupBy ships fingerprints (32 chars) and ids only; full rows
    rejoin via a semi-join on the id."""
    survivors = (
        df.select(
            F.col(id_col).alias("_id"), F.md5(normalize_text(text_col)).alias("_fp")
        )
        .groupBy("_fp")
        .agg(F.min("_id").alias(id_col))
        .select(id_col)
    )
    return df.join(survivors, on=id_col, how="left_semi")


def near_dup_keep_min(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    iterations: int = 4,
) -> DataFrame:
    """Drop every near-duplicate except its cluster's minimum id.

    Pairs come from the LSH band join (equi-join candidates, exact
    Jaccard verify); clusters from bounded min-label propagation.
    Every pair edge links docs in the same cluster and at most one
    endpoint is the cluster min, so no surviving pair remains at the
    given threshold. Docs in no pair never enter the cluster table
    and survive via the anti-join.
    """
    pairs = minhash_near_dup_pairs(
        df, id_col, text_col, k=k, num_perm=num_perm, bands=bands,
        threshold=threshold,
    )
    clusters = label_propagation_clusters(pairs, iterations=iterations)
    losers = clusters.filter(F.col("doc") != F.col("cluster")).select(
        F.col("doc").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def _funnel_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float,
    langs: Sequence[str] | None,
    near_dup_threshold: float,
    quality_col: str | None = None,
) -> list[tuple[str, DataFrame]]:
    """The single definition of the funnel's stage composition —
    ``prepare_corpus`` takes the last frame, ``corpus_funnel`` counts
    every frame, so the report always describes exactly the pipeline
    that runs (they previously each composed their own copy and had
    already drifted on checkpointing)."""
    stages: list[tuple[str, DataFrame]] = [("raw", df)]
    # The quality/lang signals are the funnel's heaviest column
    # expressions (regex splits + HOF filters); computing them ONCE
    # in a checkpointed projection means the two filter stages and
    # every downstream branch (dedup groupBy + semi-join probe both
    # re-reference the filtered frame) reuse scored rows instead of
    # re-evaluating the scoring chain per branch.
    scored = df.select(
        "*",
        quality_score(text_col).alias("_q"),
        lang_id(text_col).alias("_lang"),
    ).localCheckpoint(eager=False)
    cols = list(df.columns)
    if quality_col is not None:
        # surface the already-computed score instead of making the
        # caller re-evaluate the scoring chain on the output
        cols.append(F.col("_q").alias(quality_col))
    cur = scored.filter(F.col("_q") >= min_quality)
    stages.append(("quality", cur.select(*cols)))
    if langs is not None:
        cur = cur.filter(F.col("_lang").isin(list(langs)))
        stages.append(("lang", cur.select(*cols)))
    cur = exact_dedup_keep_min(cur.select(*cols), id_col, text_col)
    # The survivor set feeds BOTH the near-dup pair generation and
    # the final keep-one anti-join; checkpoint it (lazily — it first
    # materializes inside the pair stage's own checkpoint) so the
    # filter + semi-join prefix runs once, not once per branch.
    cur = cur.localCheckpoint(eager=False)
    stages.append(("exact_dedup", cur))
    cur = near_dup_keep_min(cur, id_col, text_col, threshold=near_dup_threshold)
    stages.append(("near_dup", cur))
    return stages


def prepare_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    langs: Sequence[str] | None = None,
    near_dup_threshold: float = 0.8,
    quality_col: str | None = None,
) -> DataFrame:
    """The full funnel; returns the cleaned corpus with the input's
    columns (plus the computed quality score as ``quality_col`` when
    requested — it's already evaluated for the filter, so surfacing
    it is free). Stage parameters are the knobs a data curator
    sweeps; ``corpus_funnel`` reports the per-stage attrition for
    that sweep."""
    return _funnel_stages(
        df, id_col, text_col, min_quality, langs, near_dup_threshold,
        quality_col=quality_col,
    )[-1][1]


def corpus_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    langs: Sequence[str] | None = None,
    near_dup_threshold: float = 0.8,
) -> list[tuple[str, int]]:
    """Per-stage surviving-row counts (the curation report). Each
    count is an aggregate job over that stage's lazy frame — rows
    never reach the driver."""
    stages = _funnel_stages(
        df, id_col, text_col, min_quality, langs, near_dup_threshold
    )
    return [(name, frame.count()) for name, frame in stages]
