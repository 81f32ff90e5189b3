"""Incremental rollup maintenance: maintained state must equal a
from-scratch recompute BITWISE, for any batch split (the
merge-associativity contract that makes 100 TB histories
never-rescanned)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.rollups import (
    merge_rollup_states,
    rollup_result,
    rollup_state,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_equals_recompute_two_batches(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_orderkey"
    )
    b1 = li.filter(F.col("l_orderkey") % 2 == 0)
    b2 = li.filter(F.col("l_orderkey") % 2 == 1)
    maintained = merge_rollup_states(
        rollup_state(b1, ["l_returnflag"], "l_quantity"),
        rollup_state(b2, ["l_returnflag"], "l_quantity"),
    )
    full = rollup_state(li, ["l_returnflag"], "l_quantity")
    assert _canon(rollup_result(maintained)) == _canon(rollup_result(full))


def test_merge_is_associative_three_batches(spark):
    rows = [("a", float(i % 7)) for i in range(30)] + [
        ("b", float(i % 3)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    thirds = [df.filter(F.crc32(F.col("v").cast("string")) % 3 == i) for i in range(3)]
    states = [rollup_state(t, ["g"], "v") for t in thirds]
    left = merge_rollup_states(merge_rollup_states(states[0], states[1]), states[2])
    right = merge_rollup_states(states[0], merge_rollup_states(states[1], states[2]))
    assert _canon(left) == _canon(right)
    assert _canon(left) == _canon(rollup_state(df, ["g"], "v"))


def test_reserved_metric_name_collision_rejected(spark):
    """A grouping column named like a metric column would be silently
    summed/dropped by merge/result (they infer the group key by
    exclusion) — rollup_state must refuse it up front."""
    df = spark.createDataFrame([("a", 1, 1.0)], ["g", "sum_val", "v"])
    with pytest.raises(ValueError, match="sum_val"):
        rollup_state(df, ["g", "sum_val"], "v")


def test_all_null_group_yields_null_metrics(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 2.0)], ["g", "v"]
    )
    out = {r["g"]: r for r in rollup_result(rollup_state(df, ["g"], "v")).collect()}
    assert out["a"]["n_rows"] == 2 and out["a"]["n_vals"] == 0
    assert out["a"]["avg_val"] is None and out["a"]["min_val"] is None
    assert out["a"]["total"] == 0.0
    assert out["b"]["avg_val"] == 2.0


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(split_mod=st.integers(min_value=2, max_value=5))
def test_split_invariance_property(spark, split_mod):
    rows = [(f"g{i % 4}", float((i * 37) % 100) / 4) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v"])
    batches = [
        df.filter(F.crc32(F.col("v").cast("string")) % split_mod == i)
        for i in range(split_mod)
    ]
    state = rollup_state(batches[0], ["g"], "v")
    for b in batches[1:]:
        state = merge_rollup_states(state, rollup_state(b, ["g"], "v"))
    assert _canon(rollup_result(state)) == _canon(
        rollup_result(rollup_state(df, ["g"], "v"))
    )
