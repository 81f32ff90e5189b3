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


def test_clustered_layout_skips_files(spark, sf_dir, tmp_path):
    """Range clustering concentrates a key range into few files, so a
    selective scan contributes rows from ~1 file; the same filter over
    a hash-scattered layout draws from every file."""
    from etl_deltalake_spark.operators.partitioning import (
        files_touched,
        write_clustered,
    )

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    lo, hi = 100, 200
    scattered_path = str(tmp_path / "scattered")
    li.repartition(16).write.mode("overwrite").parquet(scattered_path)
    clustered_path = str(tmp_path / "clustered")
    write_clustered(li, clustered_path, ["l_orderkey"], n_files=16)

    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi)
    scattered = spark.read.parquet(scattered_path).filter(pred)
    clustered = spark.read.parquet(clustered_path).filter(pred)
    assert scattered.count() == clustered.count() > 0
    assert files_touched(scattered) >= 12  # matches smeared everywhere
    assert files_touched(clustered) <= 2  # matches live in ~one range file


def test_zorder_prunes_on_nonleading_column(spark, tmp_path):
    """Lexicographic clustering on (a, b) can't prune a filter on b
    alone (every a-slice holds all of b); Z-order interleaving can."""
    from etl_deltalake_spark.operators.partitioning import (
        files_touched,
        write_clustered,
        z_value,
    )

    grid = (
        spark.range(0, 256 * 256)
        .select(
            (F.col("id") / 256).cast("int").alias("a"),
            (F.col("id") % 256).cast("int").alias("b"),
        )
    )
    linear_path, zorder_path = str(tmp_path / "lin"), str(tmp_path / "zord")
    write_clustered(grid, linear_path, ["a", "b"], n_files=16)
    write_clustered(grid, zorder_path, ["a", "b"], n_files=16, zorder_bits=8)

    pred = F.col("b") < 64
    lin = spark.read.parquet(linear_path).filter(pred)
    zord = spark.read.parquet(zorder_path).filter(pred)
    assert lin.count() == zord.count() == 256 * 64
    assert files_touched(lin) >= 12  # b is unsorted within every a-slice
    assert files_touched(zord) <= 8  # quadrant blocks: ~1/4 of files + edges

    # z_value is a bijective interleave on in-range inputs
    zs = grid.select(z_value(["a", "b"], 8).alias("z"))
    assert zs.distinct().count() == 256 * 256
    mn, mx = zs.agg(F.min("z"), F.max("z")).head()
    assert (mn, mx) == (0, 256 * 256 - 1)

    import pytest

    with pytest.raises(ValueError, match="fit a long"):
        z_value(["a", "b", "c", "d"], 16)


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
