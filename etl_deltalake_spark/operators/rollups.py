"""Incremental aggregate maintenance (materialized-view upkeep):
keep a grouped rollup current by MERGING each new batch's partial
aggregate state into the stored state, never rescanning history.

The reference recomputes its Gold layer over the full Silver table
every run (reference main.py:609, 632 — noted as the quadratic-cost
quirk in SURVEY §3); pipelines.py already bounds Gold recompute by
the watermark. This module is the general form: a rollup STATE table
whose columns are additively mergeable (count + exact decimal sums),
so

    state(T ∪ B) = merge(state(T), state(B))

holds exactly, and a 100 TB history is never touched again — each
batch costs one partial aggregation of the batch plus a merge on
O(#groups) rows. Derived metrics (avg, etc.) are computed at READ
time from the state, which is why the state stores sums+counts, not
averages (averages don't merge).

Determinism: sums accumulate in DECIMAL (exact, order-insensitive),
so maintained state equals a from-scratch recompute BITWISE — the
invariant tests/test_rollups.py pins, batch-split-invariance
included (property-based over random splits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The state contract: these columns ARE the metric state, and
# merge/result infer the group key as "everything else". A grouping
# column reusing one of these names would silently be summed/dropped,
# so rollup_state rejects the collision up front.
_METRIC_COLS = ("n_rows", "n_vals", "sum_val", "min_val", "max_val")


def rollup_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Partial aggregate state of one batch: per group, the row
    count, non-null value count, exact decimal sum, and min/max.
    Every column is additively mergeable (min/max merge by min/max).

    Raises ValueError if a group column collides with a reserved
    metric name — downstream merge/result infer the group key by
    excluding the metric names, so a collision would corrupt state.
    """
    clash = sorted(set(group_cols) & set(_METRIC_COLS))
    if clash:
        raise ValueError(
            f"group_cols {clash} collide with reserved rollup metric "
            f"columns {_METRIC_COLS}; rename them before building state"
        )
    v = F.col(value_col).cast(f"decimal(18,{decimals})")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_vals"),
        F.coalesce(F.sum(v), F.lit(0).cast(f"decimal(28,{decimals})")).alias(
            "sum_val"
        ),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_rollup_states(state: DataFrame, batch_state: DataFrame) -> DataFrame:
    """Additive merge of two state tables — one union + one groupBy
    on the group key (shuffle carries O(#groups) state rows, not
    data). sum-of-sums stays in DECIMAL so merging is exact and
    associative: any batch split yields identical state."""
    group_cols = [c for c in state.columns if c not in _METRIC_COLS]
    return (
        state.unionByName(batch_state)
        .groupBy(*group_cols)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_vals").cast("bigint").alias("n_vals"),
            F.sum("sum_val").cast(state.schema["sum_val"].dataType.simpleString())
            .alias("sum_val"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def rollup_result(state: DataFrame, scale: int = 6) -> DataFrame:
    """Read-time metrics derived from the state: total (double),
    avg, min, max, counts. Groups whose values were all null get
    NULL avg/min/max — same as a direct aggregate would."""
    group_cols = [c for c in state.columns if c not in _METRIC_COLS]
    avg = F.when(
        F.col("n_vals") > 0,
        F.round(F.col("sum_val").cast("double") / F.col("n_vals"), scale),
    )
    return state.select(
        *group_cols,
        "n_rows",
        "n_vals",
        F.col("sum_val").cast("double").alias("total"),
        avg.alias("avg_val"),
        F.col("min_val").cast("double").alias("min_val"),
        F.col("max_val").cast("double").alias("max_val"),
    )


def join_view_delta(
    old_a: DataFrame,
    delta_a: DataFrame,
    old_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view under
    append-only deltas (round 5) — the join counterpart of this
    module's mergeable aggregate state: with V = A ⋈ B materialized,
    an ingest of (ΔA, ΔB) only needs

        ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    appended to V — the A ⋈ B term (the 100 TB × 100 TB join) is
    NEVER recomputed; every term joins at least one delta side,
    which is batch-sized and broadcastable. The classical delta rule
    from incremental view maintenance (Gupta & Mumick 1995, public).
    Correctness gate: V ∪ ΔV must equal (A∪ΔA) ⋈ (B∪ΔB) exactly
    (tests + the q_join_view oracle, which recomputes the full
    join)."""
    return (
        delta_a.join(old_b, on)
        .unionByName(old_a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )
