"""Behavioral / event analytics over the events stream: ordered
conversion funnels and cohort retention — the product-analytics
surface (absent in the reference, whose events are coin ticks;
standard in any warehouse serving growth metrics).

Scale shapes:
 - ``funnel_steps``: one conditional aggregation per funnel step,
   each a groupBy on the user key (map-side combine; the join back
   is keyed on the same column so AQE reuses the partitioning).
   Steps are ORDERED: step k's timestamp is the user's earliest
   step-k event at-or-after their step-(k−1) timestamp, so a
   purchase before any click doesn't count as a conversion.
 - ``cohort_retention``: two aggregations (first-seen cohort per
   user, then distinct (cohort, offset) user counts). Cohort offset
   arithmetic is integer date math — deterministic everywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user ordered funnel: for each step, the earliest
    qualifying event timestamp (``{step}_ts``) — qualifying means
    at-or-after the previous step's timestamp — plus a reached flag.
    Users enter the output if they performed step 1.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias(f"{steps[0]}_ts"))
    )
    for prev, step in zip(steps, steps[1:]):
        nxt = (
            df.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_t"))
            .join(cur.select("user", F.col(f"{prev}_ts").alias("_p")), "user")
            .filter(F.col("_t") >= F.col("_p"))
            .groupBy("user")
            .agg(F.min("_t").alias(f"{step}_ts"))
        )
        cur = cur.join(nxt, "user", "left")
    return cur.select(
        F.col("user").alias(user_col),
        *[F.col(f"{s}_ts") for s in steps],
        *[F.col(f"{s}_ts").isNotNull().alias(f"reached_{s}") for s in steps],
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel summary: users reaching each step (ordered semantics),
    with the step index for deterministic output ordering."""
    per_user = funnel_steps(df, user_col, ts_col, type_col, steps)
    # sum over an empty frame is NULL — an empty funnel reports 0
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"reached_{s}").cast("bigint")), F.lit(0)
            ).alias(f"_n_{s}")
            for s in steps
        ]
    )
    # one posexplode over the single aggregate row (an N-way union
    # would plan N copies of the whole funnel subtree)
    kv = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"), F.col(f"_n_{s}").alias("n_users")
            )
            for s in steps
        ]
    )
    return counts.select(F.posexplode(kv).alias("_i", "_kv")).select(
        (F.col("_i") + 1).cast("bigint").alias("step_idx"),
        F.col("_kv.step").alias("step"),
        F.col("_kv.n_users").alias("n_users"),
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_secs: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based batch sessionization: assign every event a per-user
    ``session_n`` (1-based) that increments whenever the gap to the
    previous event exceeds ``gap_secs`` — the batch analogue of
    Structured Streaming's ``session_window`` (streaming/pipeline.py)
    and a building block the reference's coin-tick events pipeline
    lacks entirely.

    Determinism: ordering within equal timestamps is resolved by
    ``tiebreak_cols`` — pass a unique event id so session numbering
    is total-ordered (the user_anomaly_stats lesson: partial orders
    leak partitioning artifacts into results).

    Scale shape: ONE shuffle on the user key for the lag/cumsum
    window; downstream ``session_stats`` groups on
    (user, session_n), a superset of that partitioning, so Catalyst
    adds no second exchange. At 100 TB the state per user is a single
    window frame — no driver traffic, no UDFs.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_secs)
    ).cast("bigint")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_n", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_secs: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session rollup over ``sessionize``: event count, start,
    end, and duration seconds per (user, session_n). Same single
    shuffle as sessionize (grouping keys contain the window
    partitioning key)."""
    s = sessionize(df, user_col, ts_col, gap_secs, tiebreak_cols)
    return s.groupBy(
        F.col(user_col), F.col("session_n")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.unix_timestamp(F.col(ts_col)))
            - F.min(F.unix_timestamp(F.col(ts_col)))
        ).alias("dur_secs"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen
    ``period`` (their cohort), counted as active in each later
    period they produced any event. Offset 0 is the cohort period
    itself (n_active = cohort size by construction).
    """
    if period not in ("week", "day"):
        raise ValueError(
            f"period must be week|day (integer datediff offsets), got {period!r}"
        )
    base = df.select(
        F.col(user_col).alias("user"),
        # DATE, not timestamp: period floors are day-aligned, and the
        # SQL standard's date_trunc-on-week yields DATE in DuckDB
        F.to_date(F.date_trunc(period, F.col(ts_col))).alias("p"),
    )
    firsts = base.groupBy("user").agg(F.min("p").alias("cohort"))
    activity = (
        base.join(firsts, "user")
        .select(
            "user",
            "cohort",
            # integer period offset: exact date arithmetic, no floats
            (
                F.datediff(F.col("p"), F.col("cohort"))
                / (7 if period == "week" else 1)
            )
            .cast("bigint")
            .alias("offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "offset").agg(
        F.countDistinct("user").alias("n_active")
    )


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_days: int = 3,
) -> DataFrame:
    """First-touch AND last-touch attribution (round 8): for every
    conversion event, find the earliest and the latest touch event of
    the same user inside the ``(conv_ts - lookback, conv_ts]``
    window, under a TOTAL (ts, event id) order so ties are
    deterministic; conversions with no in-window touch attribute to
    null (kept — unattributed volume is the number marketing actually
    argues about).

    Shape: conversions ⋈ touches is an EQUI-join on the user key with
    the window bounds as post-join filters (no all-pairs; per-user
    touch × conversion pairs only), then one window per conversion id
    picks both endpoints in a single pass (first_value/last_value
    over the same ordered frame), then a left join re-attaches
    unattributed conversions. At 100 TB the user-key shuffle is the
    cost; AQE handles hot users, and the lookback filter bounds the
    per-user pair fan-out.

    Output: one row per conversion — ``(conv_id, user, first_touch,
    last_touch)`` with null touches when unattributed.
    """
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("conv_ts"),
        F.col(id_col).alias("conv_id"),
    )
    touch = df.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("touch_ts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
    )
    paired = conv.join(touch, "user").filter(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {lookback_days} DAYS")
        )
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("touch_ts", "touch_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    attributed = (
        paired.withColumn("first_touch", F.first("touch_type").over(w))
        .withColumn("last_touch", F.last("touch_type").over(w))
        .select("conv_id", "user", "first_touch", "last_touch")
        .distinct()
    )
    return conv.select("conv_id", "user").join(
        attributed, ["conv_id", "user"], "left"
    )
