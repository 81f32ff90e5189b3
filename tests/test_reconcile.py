"""Reconciliation semantics (operators/reconcile.py): keyed diff
classification and the one-pass column profiler. Cross-engine gates
are the q_table_diff / q_profile oracles in
tests/test_retired_queries.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.reconcile import (
    diff_summary,
    profile_columns,
    table_diff,
)


def test_diff_classifies_all_four_cases(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k bigint, attr string, v bigint",
    )
    right = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k bigint, attr string, v bigint",
    )
    got = {r["k"]: r["diff"] for r in table_diff(left, right, ["k"]).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",       # attr b -> B
        3: "removed",
        4: "unchanged",     # NULL == NULL under null-safe compare
        5: "added",
    }
    summary = {r["diff"]: r["n"] for r in diff_summary(left, right, ["k"]).collect()}
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_diff_respects_compare_cols_subset(spark):
    left = spark.createDataFrame([(1, "a", 1)], "k bigint, attr string, v bigint")
    right = spark.createDataFrame([(1, "a", 999)], "k bigint, attr string, v bigint")
    only_attr = table_diff(left, right, ["k"], ["attr"]).collect()
    assert only_attr[0]["diff"] == "unchanged"
    full = table_diff(left, right, ["k"]).collect()
    assert full[0]["diff"] == "changed"
    with pytest.raises(ValueError, match="key_cols"):
        table_diff(left, right, [])


def test_profile_counts_nulls_distincts_minmax(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")],
        "id bigint, cat string",
    )
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert prof["id"]["n_null"] == 1
    assert prof["id"]["n_distinct"] == 2
    assert (prof["id"]["min_str"], prof["id"]["max_str"]) == ("1", "2")
    assert prof["cat"]["n_null"] == 1
    assert prof["cat"]["n_distinct"] == 2
    assert (prof["cat"]["min_str"], prof["cat"]["max_str"]) == ("x", "y")
    with pytest.raises(ValueError, match="unknown columns"):
        profile_columns(df, ["nope"])


def test_profile_approx_within_tolerance(spark, sf_dir):
    from etl_deltalake_spark.sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    exact = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(orders, ["o_custkey"]).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(orders, ["o_custkey"], approx=True).collect()
    }
    rel = abs(approx["o_custkey"] - exact["o_custkey"]) / exact["o_custkey"]
    assert rel < 0.1


def test_diff_plan_is_single_key_join(spark, sf_dir):
    from etl_deltalake_spark.plans.inspect import assert_scale_safe
    from etl_deltalake_spark.plans.queries_ext import q_table_diff

    report = assert_scale_safe(q_table_diff(spark, sf_dir))
    assert report["sort_merge_joins"] + report["hash_joins"] == 1


def test_diff_null_keys_classified_by_side_not_key(spark):
    """NULL-keyed rows must classify by which side holds them (they
    match each other under eqNullSafe), never blanket-'added'."""
    schema = "k bigint, v string"
    l_only = spark.createDataFrame([(None, "x")], schema)
    empty = spark.createDataFrame([], schema)
    assert table_diff(l_only, empty, ["k"]).collect()[0]["diff"] == "removed"
    assert table_diff(empty, l_only, ["k"]).collect()[0]["diff"] == "added"
    both = table_diff(l_only, spark.createDataFrame([(None, "y")], schema), ["k"])
    assert both.collect()[0]["diff"] == "changed"


def test_schema_drift(spark):
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.reconcile import schema_drift

    old = spark.createDataFrame(
        [(1, "a", 1.0)], "id long, name string, score double"
    )
    new = (
        old.drop("score")
        .withColumn("id", F.col("id").cast("int"))
        .withColumn("added_col", F.lit(True))
    )
    got = {
        r["column"]: (r["status"], r["old_type"], r["new_type"])
        for r in schema_drift(old, new).collect()
    }
    assert got == {
        "added_col": ("added", None, "boolean"),
        "id": ("type_changed", "bigint", "int"),
        "name": ("unchanged", "string", "string"),
        "score": ("removed", "double", None),
    }
