"""Time-series regularization: bucket → gap-filled grid → LOCF
(last observation carried forward).

The reference's time-series handling is implicit (appended ticker
snapshots diffed per coin, SURVEY §2.5); a real analytics engine also
needs the inverse operation — turning an irregular event stream into
a regular grid with explicit gaps. This is the standard
resample/interpolate surface (pandas ``resample().ffill()``,
TimescaleDB ``time_bucket_gapfill + locf``) expressed as DataFrame
ops.

Scale shape (three key-partitioned shuffles, no driver-side data):
1. bucket reduction — window row_number over (key, bucket) keeps the
   LAST observation per bucket under a TOTAL order (ts, then a
   tiebreak id) so re-runs and the SQL oracle agree on ties;
2. per-key span + ``sequence`` explode builds the grid — grid size
   is span/step per key, generated distributed, never collected;
3. the LOCF window runs per key ordered by bucket.
Carried values pass through untouched (no float arithmetic), so
cross-engine comparison is bitwise by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 day",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regularize per-key series onto a ``step`` grid with LOCF fill.

    Buckets are ``date_trunc`` periods (``step`` ∈ day/hour/minute…);
    each key's grid spans its own first..last observed bucket. Output
    one row per (key, bucket):
      value_locf  last observed value at or before the bucket
      is_gap      true when the bucket itself had no observation

    Within a bucket the surviving observation is the max-(ts,
    tiebreak) row; pass a unique ``tiebreak_col`` for full
    determinism when equal timestamps occur.

    ``step`` may be a multiple of a fixed-duration unit ("15 minutes",
    "2 days"): those buckets are epoch-aligned floors so the grid's
    ``sequence`` lands exactly on bucket boundaries. Calendar units
    (month/year, variable duration) are only valid with count 1, where
    ``date_trunc`` is the correct bucketing; any other combination
    raises instead of silently dropping off-grid observations.
    """
    parts = step.split()
    n = int(parts[0]) if len(parts) == 2 and parts[0].isdigit() else 1
    unit = parts[-1].rstrip("s")
    _fixed_secs = {
        "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
    }
    if n > 1 and unit not in _fixed_secs:
        raise ValueError(
            f"resample_locf: step {step!r} mixes a multi-count with the "
            f"calendar unit {unit!r} (variable duration); only counts of "
            f"1 are supported for month/year"
        )
    if n > 1:
        step_secs = n * _fixed_secs[unit]
        def _bucket(c):
            return F.timestamp_seconds(
                F.floor(F.unix_timestamp(c) / step_secs) * step_secs
            )
    else:
        def _bucket(c):
            return F.date_trunc(unit, c)
    order = [F.col("_ts").desc()]
    if tiebreak_col is not None:
        order.append(F.col("_tb").desc())
    b = df.select(
        F.col(key_col).alias("key"),
        _bucket(F.col(ts_col)).alias("bucket"),
        F.col(ts_col).alias("_ts"),
        *( [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else [] ),
        F.col(value_col).alias("value"),
    )
    wb = Window.partitionBy("key", "bucket").orderBy(*order)
    obs = (
        b.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select("key", "bucket", "value")
    )
    grid = (
        b.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    j = grid.join(obs, ["key", "bucket"], "left")
    wl = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "key",
        "bucket",
        F.last("value", ignorenulls=True).over(wl).alias("value_locf"),
        F.col("value").isNull().alias("is_gap"),
    )


def rolling_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_secs: int = 3600,
    z_threshold: float = 3.0,
    decimals: int = 2,
) -> DataFrame:
    """Event-time rolling mean/std + z-score anomaly flag per key:
    each row's statistics cover the trailing ``window_secs`` seconds
    (a RANGE frame over epoch seconds — value-based, so ties and
    gaps behave identically in Spark and the SQL oracle, unlike a
    ROWS frame whose tie order is engine-dependent).

    One shuffle on the key; the frame slides per partition. The
    moments come from exact DECIMAL window sums (values quantized at
    ``decimals``), so mean/var are ratios of exact integers — the
    float math is deterministic and the DuckDB oracle reproduces it
    bitwise. Sample variance (n−1); rows with a singleton frame get
    NULL std/z and a false flag.

    At 100 TB this is the standard telemetry-anomaly shape: the only
    cost is the per-key shuffle, state is one frame per key, and
    skewed keys split under AQE.
    """
    sec = F.unix_timestamp(F.col(ts_col)).alias("_sec")
    v = F.col(value_col).cast(f"decimal(18,{decimals})")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        sec,
        v.alias("_v"),
        (v * v).alias("_v2"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("_sec")
        .rangeBetween(-window_secs, 0)
    )
    n = F.count(F.lit(1)).over(w)
    # Bounded re-casts keep every decimal product/sum inside BOTH
    # engines' 38-digit cap (Spark silently rounds on overflow via
    # precision-loss, DuckDB errors): frame sums fit (18,2)/(18,4)
    # for quantized telemetry values, counts fit (12,0).
    from etl_deltalake_spark.operators.stats import exact_mean_var

    d1, d2 = decimals, 2 * decimals
    s1 = F.sum("_v").over(w).cast(f"decimal(18,{d1})")
    s2 = F.sum("_v2").over(w).cast(f"decimal(18,{d2})")
    # sample variance from exact sums: (n·Σx² − (Σx)²) / (n·(n−1))
    mean, var = exact_mean_var(n, s1, s2, d2)
    std = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
    z = F.when(
        (n > 1) & (std > 0), (F.col("_v").cast("double") - mean) / std
    )
    return base.select(
        "key",
        "ts",
        F.col("_v").cast("double").alias("value"),
        n.cast("bigint").alias("n_win"),
        F.round(mean, 6).alias("mean_win"),
        F.round(std, 6).alias("std_win"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 day",
    tiebreak_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """``resample_locf``'s linear-interpolation sibling: gaps fill
    with the time-weighted line between the surrounding observations
    instead of carrying the last value —
    v = v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev).

    Output per (key, bucket): ``value_interp`` (observed values pass
    through untouched; interpolated values round to ``scale``) and
    ``is_gap``. The grid spans each key's first..last observed
    bucket, so every gap has both neighbors — no extrapolation
    branch exists to get wrong.

    Scale shape: identical to resample_locf (bucket reduction → grid
    explode → per-key window) plus ONE extra window direction: prev
    = last non-null (bucket, value) looking back, next = first
    looking forward, both over the same key partitioning — Catalyst
    plans one sort, two frames, no extra shuffle.
    """
    locf_base = resample_locf(
        df, key_col, ts_col, value_col, step, tiebreak_col
    )
    # recover the raw per-bucket observation: value_locf where not a
    # gap IS the observed value
    base = locf_base.select(
        "key",
        "bucket",
        F.when(~F.col("is_gap"), F.col("value_locf")).alias("_obs"),
        "is_gap",
    )
    sec = F.unix_timestamp(F.col("bucket")).cast("double")
    mark = F.when(
        F.col("_obs").isNotNull(),
        F.struct(sec.alias("s"), F.col("_obs").alias("v")),
    )
    back = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(mark, ignorenulls=True).over(back)
    nxt = F.first(mark, ignorenulls=True).over(fwd)
    interp = prev["v"] + (nxt["v"] - prev["v"]) * (
        (sec - prev["s"]) / (nxt["s"] - prev["s"])
    )
    return base.select(
        "key",
        "bucket",
        F.when(~F.col("is_gap"), F.col("_obs"))
        .otherwise(F.round(interp, scale))
        .alias("value_interp"),
        "is_gap",
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int = 24,
    half_window: int = 2,
) -> DataFrame:
    """Classical additive seasonal decomposition per key over an
    hourly-bucketed series: value = trend + seasonal + residual —
    the moving-average decomposition every monitoring/forecasting
    pipeline runs before modelling (statsmodels' seasonal_decompose
    shape, expressed relationally).

      bucket    hourly sum of DECIMAL(18,2)-cast values (the
                rolling-anomaly input convention);
      trend     centered (2·half_window+1)-bucket moving average,
                defined only where the window is FULL — from the
                exact decimal window sum, so it is order-independent;
      seasonal  per (key, phase = bucket_index mod period) mean of
                the detrended series, computed from GROUP-level
                decimal sums (Σv and Σwindow-sums — never a
                float-accumulation over rows), centered by the
                key-global detrended mean derived the same way;
      residual  value − trend − seasonal.

    Every reported float derives from exact decimal sums through a
    fixed sequence of IEEE ops, so the DuckDB oracle matches bitwise
    after ROUND(..,6). Shuffles: the bucket aggregation, one window
    per key, the per-(key,phase) aggregate joined back (broadcast-
    small: ≤ period rows per key), one per-key global aggregate.
    Output: key, bucket, phase, v, trend, seasonal, resid.
    """
    w = 2 * half_window + 1
    b = df.select(
        F.col(key_col).alias("key"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    ).groupBy("key", "bucket").agg(F.sum("_v").alias("v_dec"))
    b = b.withColumn(
        "phase",
        F.pmod((F.unix_timestamp("bucket") / 3600).cast("long"), period),
    )
    win = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-half_window, half_window)
    )
    b = b.withColumn("_s1", F.sum("v_dec").over(win)).withColumn(
        "_n_win", F.count(F.lit(1)).over(win)
    )
    b = b.withColumn(
        "trend",
        F.when(
            F.col("_n_win") == w, F.col("_s1").cast("double") / F.lit(w)
        ),
    )
    full = b.filter(F.col("trend").isNotNull())
    by_phase = full.groupBy("key", "phase").agg(
        F.sum("v_dec").alias("pv"),
        F.sum("_s1").alias("pma"),
        F.count(F.lit(1)).alias("pn"),
    )
    by_key = full.groupBy("key").agg(
        F.sum("v_dec").alias("gv"),
        F.sum("_s1").alias("gma"),
        F.count(F.lit(1)).alias("gn"),
    )
    seasonal = (
        F.col("pv").cast("double") / F.col("pn")
        - F.col("pma").cast("double") / (F.col("pn") * w)
    ) - (
        F.col("gv").cast("double") / F.col("gn")
        - F.col("gma").cast("double") / (F.col("gn") * w)
    )
    out = (
        b.join(by_phase, ["key", "phase"], "left")
        .join(by_key, "key", "left")
        .withColumn("seasonal", seasonal)
    )
    v_dbl = F.col("v_dec").cast("double")
    return out.select(
        "key",
        "bucket",
        "phase",
        F.round(v_dbl, 6).alias("v"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(v_dbl - F.col("trend") - F.col("seasonal"), 6).alias(
            "resid"
        ),
    )
