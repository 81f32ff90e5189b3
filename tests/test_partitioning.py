"""Bucketed co-located joins (no exchange) and skew salting."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.partitioning import (
    read_bucketed,
    salted_join,
    write_bucketed,
)
from etl_deltalake_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"), ["o_custkey"], 8,
        sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer, "b_customer", str(tmp_path / "b_customer"), ["c_custkey"], 8,
        sort_cols=["c_custkey"],
    )
    bo, bc = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_customer")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        joined.collect()
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange hashpartitioning", plan), plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    customer = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey)
    salted = salted_join(orders, customer, "o_custkey", "c_custkey", salt_n=8)
    cols = ["o_orderkey", "o_custkey", "c_custkey", "c_mktsegment"]
    a = sorted(map(tuple, plain.select(*cols).collect()))
    b = sorted(map(tuple, salted.select(*cols).collect()))
    assert a == b


def test_salted_join_rejects_outer_right(spark, sf_dir):
    """Right side is replicated salt_n times — right/full outer would
    duplicate unmatched right rows, so those modes must refuse."""
    import pytest

    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    customer = load_table(spark, "customer", sf_dir).select("c_custkey")
    for how in ("right", "full", "left_semi"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(orders, customer, "o_custkey", "c_custkey", how=how)


def test_salt_spreads_hot_key(spark):
    from etl_deltalake_spark.operators.partitioning import salt_col

    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    salted = hot.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct("k", "id")), F.lit(8)).cast("int")
    )
    counts = [r["count"] for r in salted.groupBy("_salt").count().collect()]
    assert len(counts) == 8
    assert max(counts) < 10000 * 0.25  # no single reducer owns the key
    # salt_col is deterministic
    s1 = hot.select(salt_col(F.col("id"), 8).alias("s")).collect()
    s2 = hot.select(salt_col(F.col("id"), 8).alias("s")).collect()
    assert s1 == s2
