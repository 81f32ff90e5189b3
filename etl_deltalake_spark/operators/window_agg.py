"""Windowed aggregation operators — the reference's Gold layer.

Re-expresses ``columnas_agregacion`` (reference main.py:345-388,
SURVEY §2.5): grouped lag-difference (A3) and grouped running sum
(A4) per group key.

Semantics pinned from the reference:
 - A3 ``diff_{c}``: per-group first row gets its OWN value, not null
   (``diff().fillna(df[c])``, main.py:376-377) → ``coalesce(c -
   lag(c), c)``.
 - A4 ``cumsum_{c}``: running sum within group (main.py:380-381).
 - Ordering: the reference sorts by the value columns themselves
   (main.py:373), which is order-unstable under duplicates (SURVEY
   §2.5 caveat). This engine requires an explicit TOTAL ordering
   (``order_cols``) so results are deterministic and oracle-stable.

Scale: a window partitioned by the group key is ONE hash shuffle on
that key; both A3 and A4 (and any other per-group window expr) share
it — Catalyst evaluates all window functions over the same
(partition, order) spec in a single Window physical node. Skewed
group keys are handled by AQE; there is no driver-side loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _as_list(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def grouped_diff(c: str, w: WindowSpec) -> Column:
    """A3: c - lag(c) within the window; first row keeps its own value."""
    return F.coalesce(F.col(c) - F.lag(c, 1).over(w), F.col(c))


def grouped_cumsum(c: str, w: WindowSpec) -> Column:
    """A4: running sum of c within the window."""
    return F.sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))


def gold_aggregation(
    df: DataFrame,
    group_col: str | Sequence[str],
    diff_cols: str | Sequence[str],
    cumsum_cols: str | Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """The reference's Gold transform: add diff_* and cumsum_* columns.

    Equivalent of reference main.py:345-388 with a deterministic
    ordering contract. Accepts str-or-list for the column args (A1,
    main.py:366-370).
    """
    group = _as_list(group_col)
    diffs = _as_list(diff_cols)
    cumsums = _as_list(cumsum_cols)
    if not order_cols:
        raise ValueError("order_cols must be a non-empty total ordering")
    w = Window.partitionBy(*group).orderBy(*order_cols)
    cols = [df[c] for c in df.columns]
    cols += [grouped_diff(c, w).alias(f"diff_{c}") for c in diffs]
    cols += [grouped_cumsum(c, w).alias(f"cumsum_{c}") for c in cumsums]
    return df.select(*cols)


def gold_aggregation_incremental(
    new_rows: DataFrame,
    state: DataFrame | None,
    group_col: str | Sequence[str],
    diff_cols: str | Sequence[str],
    cumsum_cols: str | Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Gold diff/cumsum over ONLY the new batch, seeded from per-group
    carry-over state — the CDF-style incremental recompute (VERDICT
    r01 item 9: Gold cost proportional to the delta, not to Silver).

    ``state`` has one row per group: ``prev_{c}`` (the last seen
    value) for each diff column and ``prev_cumsum_{c}`` (the running
    total so far) for each cumsum column; None/empty means cold
    start. Within the batch the normal window computes; the batch's
    FIRST row per group splices onto history (diff against
    ``prev_{c}`` instead of keeping its own value) and every running
    sum is offset by ``prev_cumsum_{c}``. Appending the result to the
    existing Gold table equals a full recompute over all of Silver
    (proven in tests/test_pipelines.py) while scanning only the new
    rows plus one state row per group (broadcast-sized).
    """
    group = _as_list(group_col)
    diffs = _as_list(diff_cols)
    cumsums = _as_list(cumsum_cols)
    out = gold_aggregation(new_rows, group, diffs, cumsums, order_cols)
    if state is None:
        return out
    w = Window.partitionBy(*group).orderBy(*order_cols)
    out = out.withColumn("_rn", F.row_number().over(w))
    out = out.join(F.broadcast(state), on=group, how="left")
    fixed = [F.col(c) for c in new_rows.columns]
    for c in diffs:
        prev = F.col(f"prev_{c}")
        fixed.append(
            F.when(
                (F.col("_rn") == 1) & prev.isNotNull(), F.col(c) - prev
            )
            .otherwise(F.col(f"diff_{c}"))
            .alias(f"diff_{c}")
        )
    for c in cumsums:
        fixed.append(
            (F.col(f"cumsum_{c}") + F.coalesce(F.col(f"prev_cumsum_{c}"), F.lit(0.0)))
            .alias(f"cumsum_{c}")
        )
    return out.select(*fixed)


def gold_state_from(
    gold: DataFrame,
    group_col: str | Sequence[str],
    diff_cols: str | Sequence[str],
    cumsum_cols: str | Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Carry-over state for ``gold_aggregation_incremental``: each
    group's latest Gold row, projected to prev values/running totals.

    Derived with one window over the Gold table; at scale keep a
    compact one-row-per-group state table updated on each append (or
    Z-order Gold on the group key) so this scan prunes instead of
    reading full history.
    """
    group = _as_list(group_col)
    diffs = _as_list(diff_cols)
    cumsums = _as_list(cumsum_cols)
    w = Window.partitionBy(*group).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = gold.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.select(
        *group,
        *[F.col(c).alias(f"prev_{c}") for c in diffs],
        *[F.col(f"cumsum_{c}").alias(f"prev_cumsum_{c}") for c in cumsums],
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (SURVEY §2.8 sorts/limit).

    One shuffle on the group key; the sort is per-partition. For
    severe skew prefer ``F.rank``+pre-aggregation or AQE skew split.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
