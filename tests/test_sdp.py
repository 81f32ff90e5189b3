"""Local Spark Declarative Pipelines runner (etl_deltalake_spark/sdp.py,
round 10): the REAL ``pyspark.pipelines`` decorator API (Spark 4.1
SDP) executed against the classic local session through our
implementation of the public ``GraphElementRegistry`` ABC — the
stock distribution only ships the Spark Connect runner. Covers
dependency resolution (declaration order ≠ execution order),
append_flow fan-in (batch backfill + streaming), sinks, temp views,
per-flow spark_conf scoping, schema enforcement, error reporting,
and medallion parity with the imperative pipelines.py path."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sdp import (
    declare_medallion,
    run_pipeline,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _p() -> str:
    return f"t{uuid.uuid4().hex[:8]}"


def test_out_of_order_declaration_resolves(spark, tmp_path):
    """gold is declared before silver before bronze; the fixpoint
    resolver must still materialize bronze → silver → gold."""
    from pyspark import pipelines as dp

    p = _p()

    def define():
        @dp.materialized_view(name=f"{p}_gold")
        def gold():
            return (
                spark.read.table(f"{p}_silver")
                .groupBy("k")
                .agg(F.sum("v").alias("total"))
            )

        @dp.materialized_view(name=f"{p}_silver")
        def silver():
            return spark.read.table(f"{p}_bronze").filter(F.col("v") > 0)

        @dp.table(name=f"{p}_bronze")
        def bronze():
            return spark.createDataFrame(
                [("a", 1), ("a", -5), ("b", 2), ("b", 3)], ["k", "v"]
            )

    out = run_pipeline(spark, define, str(tmp_path / "sdp"))
    assert set(out) == {f"{p}_bronze", f"{p}_silver", f"{p}_gold"}
    assert _rows(out[f"{p}_gold"]) == [("a", 1), ("b", 5)]
    # tables are PHYSICAL: parquet exists under storage
    import os

    assert os.path.isdir(str(tmp_path / "sdp" / f"{p}_bronze"))


def test_append_flows_batch_backfill_plus_streaming(spark, tmp_path, sf_dir):
    """create_streaming_table fed by TWO append flows — a one-shot
    batch backfill and a real availableNow streaming flow — must hold
    the union exactly once."""
    from pyspark import pipelines as dp

    p = _p()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = ev.select("event_id", "event_type").schema

    def define():
        dp.create_streaming_table(name=f"{p}_st")

        @dp.append_flow(target=f"{p}_st", name="backfill")
        def backfill():
            return (
                spark.read.parquet(f"{sf_dir}/events.parquet")
                .filter(F.col("event_id") % 2 == 0)
                .select("event_id", "event_type")
            )

        @dp.append_flow(target=f"{p}_st", name="live")
        def live():
            from etl_deltalake_spark.streaming.pipeline import (
                read_events_stream,
            )

            return (
                read_events_stream(spark, sf_dir, sf_dir)
                .filter(F.col("event_id") % 2 == 1)
                .select("event_id", "event_type")
            )

    out = run_pipeline(spark, define, str(tmp_path / "sdp"))
    got = out[f"{p}_st"]
    assert got.schema == schema
    expect = ev.select("event_id", "event_type")
    assert got.count() == expect.count()
    assert _rows(got) == _rows(expect)


def test_sink_and_temporary_view(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()
    sink_path = str(tmp_path / "sinkout")

    def define():
        @dp.temporary_view(name=f"{p}_v")
        def v():
            return spark.range(5).select(
                F.col("id"), (F.col("id") * 2).alias("dbl")
            )

        dp.create_sink(
            name=f"{p}_sink", format="parquet", options={"path": sink_path}
        )

        @dp.append_flow(target=f"{p}_sink")
        def to_sink():
            return spark.read.table(f"{p}_v").filter(F.col("id") >= 2)

    out = run_pipeline(spark, define, str(tmp_path / "sdp"))
    assert _rows(out[f"{p}_sink"]) == [(2, 4), (3, 6), (4, 8)]
    assert _rows(spark.read.parquet(sink_path)) == [(2, 4), (3, 6), (4, 8)]


def test_flow_spark_conf_scoped(spark, tmp_path):
    """A flow's spark_conf applies during ITS execution and is
    restored afterwards."""
    from pyspark import pipelines as dp

    p = _p()
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen = {}

    def define():
        @dp.materialized_view(name=f"{p}_mv", spark_conf={key: "3"})
        def mv():
            seen["during"] = spark.conf.get(key)
            return spark.range(3).select("id")

    run_pipeline(spark, define, str(tmp_path / "sdp"))
    assert seen["during"] == "3"
    assert spark.conf.get(key) == before


def test_declared_schema_enforced(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()

    def define():
        # @dp.table is SDP's STREAMING table (batch flows append);
        # materialized_view is the batch-recompute form — the schema
        # contract must hold on both paths
        @dp.table(name=f"{p}_t", schema="id BIGINT, label STRING")
        def t():
            return spark.range(2).select(
                "id", F.lit(7).alias("label")  # int → cast to string
            )

        @dp.materialized_view(
            name=f"{p}_mv", schema="id BIGINT, label STRING"
        )
        def mv():
            return spark.range(2).select(
                "id", F.lit(9).alias("label")
            )

    out = run_pipeline(spark, define, str(tmp_path / "sdp"))
    assert dict(out[f"{p}_t"].dtypes) == {"id": "bigint", "label": "string"}
    assert dict(out[f"{p}_mv"].dtypes) == {
        "id": "bigint", "label": "string",
    }

    def define_bad():
        @dp.materialized_view(
            name=f"{p}_bad", schema="id BIGINT, missing STRING"
        )
        def bad():
            return spark.range(2).select("id")

    with pytest.raises(ValueError, match="missing"):
        run_pipeline(spark, define_bad, str(tmp_path / "sdp2"))


def test_unresolvable_reports_missing_upstream(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()

    def define():
        @dp.materialized_view(name=f"{p}_orphan")
        def orphan():
            return spark.read.table(f"{p}_never_registered")

    with pytest.raises(ValueError, match="cannot make progress"):
        run_pipeline(spark, define, str(tmp_path / "sdp"))


def test_flowless_dataset_and_duplicate_name_rejected(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()

    def define():
        dp.create_streaming_table(name=f"{p}_empty")

    with pytest.raises(ValueError, match="no flow"):
        run_pipeline(spark, define, str(tmp_path / "sdp"))

    def define_dup():
        @dp.materialized_view(name=f"{p}_d")
        def one():
            return spark.range(1)

        @dp.table(name=f"{p}_d")
        def two():
            return spark.range(1)

    with pytest.raises(ValueError, match="duplicate"):
        run_pipeline(spark, define_dup, str(tmp_path / "sdp2"))


def test_medallion_sdp_matches_imperative(spark, tmp_path):
    """The reference medallion declared through pyspark.pipelines
    must produce EXACTLY the rows of the imperative operator chain
    it re-expresses (declaration is gold-first — resolution order is
    the runner's, not the file's)."""
    raw = spark.createDataFrame(
        [
            ("BTC", "2024-01-01T00:00:00", "100.5", "10"),
            ("BTC", "2024-01-02T00:00:00", "", "20"),
            ("BTC", "2024-01-03T00:00:00", "103.25", "junk"),
            ("ETH", "2024-01-01T00:00:00", "10.0", "5"),
            ("ETH", "2024-01-02T00:00:00", "11.5", "7"),
        ],
        ["symbol", "ingest_ts", "price_usd", "volume24"],
    )
    define, names = declare_medallion(spark, raw)
    out = run_pipeline(spark, define, str(tmp_path / "sdp"))

    # imperative twin
    from etl_deltalake_spark.operators.cleaning import (
        coerce_numeric,
        empty_to_null,
    )
    from etl_deltalake_spark.operators.window_agg import gold_aggregation

    s = empty_to_null(raw, ["price_usd", "volume24"])
    s = coerce_numeric(s, ["price_usd", "volume24"])
    s = s.filter(F.col("price_usd").isNotNull())
    g = gold_aggregation(
        s,
        group_col="symbol",
        diff_cols="price_usd",
        cumsum_cols="volume24",
        order_cols=["ingest_ts"],
    ).select(
        "symbol", "ingest_ts", "price_usd", "diff_price_usd",
        "cumsum_volume24",
    )
    assert _rows(out[names["gold"]]) == _rows(g)
    # BTC day-2 has an empty price → dropped in silver → 4 rows
    assert out[names["gold"]].count() == 4
    assert _rows(out[names["silver"]].select("symbol")) == _rows(
        s.select("symbol")
    )


def test_register_sql_honestly_unsupported():
    from pathlib import Path

    from etl_deltalake_spark.sdp import LocalGraphRegistry

    with pytest.raises(NotImplementedError):
        LocalGraphRegistry().register_sql("SELECT 1", Path("x.sql"))


def test_flow_spark_conf_applies_at_action_time(spark, tmp_path):
    """Spark confs act when JOBS run, not at analysis: a flow's
    shuffle-partitions conf must shape the MATERIALIZED output (file
    count under the storage dir follows the shuffle partitioning of
    the job that wrote it)."""
    from pyspark import pipelines as dp

    p = _p()
    key = "spark.sql.shuffle.partitions"

    def define():
        @dp.materialized_view(name=f"{p}_m3", spark_conf={key: "3"})
        def m3():
            return (
                spark.range(100)
                .groupBy((F.col("id") % 50).alias("k"))
                .count()
            )

    out = run_pipeline(spark, define, str(tmp_path / "sdp"))
    # the aggregate ran with 3 shuffle partitions → ≤3 part files
    import os

    parts = [
        f
        for f in os.listdir(str(tmp_path / "sdp" / f"{p}_m3"))
        if f.startswith("part-")
    ]
    assert 1 <= len(parts) <= 3, parts
    assert out[f"{p}_m3"].count() == 50


def test_conflicting_flow_confs_rejected(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()

    def define():
        dp.create_streaming_table(name=f"{p}_st")

        @dp.append_flow(
            target=f"{p}_st", name="a",
            spark_conf={"spark.sql.shuffle.partitions": "3"},
        )
        def a():
            return spark.range(2).select("id")

        @dp.append_flow(
            target=f"{p}_st", name="b",
            spark_conf={"spark.sql.shuffle.partitions": "5"},
        )
        def b():
            return spark.range(2).select("id")

    with pytest.raises(ValueError, match="conflicting"):
        run_pipeline(spark, define, str(tmp_path / "sdp"))


def test_sdp_streams_cdf_into_txn_sink_restartable(spark, tmp_path):
    """Round 11 (VERDICT r10 Next #6): the two round-10 storage hops
    composed UNDER the declarative executor — a streaming table fed
    by the versionedcdf source AND a ``versionedtxn`` sink (the
    exactly-once foreachBatch txn sink as a declarative sink format)
    — then a kill mid-graph, a restart, and an incremental resume
    after a new upstream commit. Restartability must compose with
    exactly-once across the declarative boundary: no hop loses or
    duplicates a row through any of the three runs."""
    from pyspark import pipelines as dp

    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )
    from etl_deltalake_spark.sources.versioned import versioned_table

    spark.dataSource.register(VersionedCdfDataSource)
    p = _p()
    src = versioned_table(spark, str(tmp_path / "src"), use_delta=False)
    dst_path = str(tmp_path / "dst")
    storage = str(tmp_path / "sdp")

    def batch(v):
        return spark.createDataFrame(
            [(v * 10 + i, f"e{v}") for i in range(3)],
            "id long, tag string",
        )

    src.write(batch(0), timestamp="2026-01-01T00:00:00")
    src.write(batch(1), timestamp="2026-01-02T00:00:00")

    def cdf_stream():
        return (
            spark.readStream.format("versionedcdf")
            .option("path", src.path)
            .load()
            .select("id", "tag", F.col("_change_version").alias("v"))
        )

    def make_define(gold_fn):
        def define():
            dp.create_streaming_table(name=f"{p}_bronze")

            @dp.append_flow(target=f"{p}_bronze", name="bronze_in")
            def bronze_in():
                return cdf_stream()

            dp.create_sink(
                name=f"{p}_hop",
                format="versionedtxn",
                options={"path": dst_path, "appId": f"{p}_app"},
            )

            @dp.append_flow(target=f"{p}_hop", name="hop_in")
            def hop_in():
                return cdf_stream()

            @dp.materialized_view(name=f"{p}_gold")
            def gold():
                return gold_fn()

        return define

    def good_gold():
        return (
            spark.read.table(f"{p}_bronze")
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        )

    def crash_gold():
        raise RuntimeError("injected mid-graph crash")

    # run 1: bronze and the txn sink drain versions 1-2, then the
    # graph dies before gold materializes
    with pytest.raises(RuntimeError, match="injected"):
        run_pipeline(spark, make_define(crash_gold), storage)
    dst = versioned_table(spark, dst_path, use_delta=False)
    assert dst.read().count() == 6  # both commits, exactly once

    def expect_rows(n_versions):
        return sorted(
            (v * 10 + i, f"e{v}", v + 1)
            for v in range(n_versions)
            for i in range(3)
        )

    # run 2: restart with the SAME storage dir — bronze's checkpoint
    # and the sink's (appId, epoch) txn state make the replay a
    # no-op; gold now materializes
    out = run_pipeline(spark, make_define(good_gold), storage)
    assert _rows(dst.read()) == expect_rows(2)
    assert _rows(out[f"{p}_bronze"]) == expect_rows(2)
    assert _rows(out[f"{p}_gold"]) == [(1, 3, 3), (2, 3, 33)]

    # run 3: a THIRD upstream commit, full re-run — both hops resume
    # incrementally (only version 3 streams) and nothing duplicates
    src.write(batch(2), timestamp="2026-01-03T00:00:00")
    out = run_pipeline(spark, make_define(good_gold), storage)
    assert _rows(dst.read()) == expect_rows(3)
    assert _rows(out[f"{p}_bronze"]) == expect_rows(3)
    assert _rows(out[f"{p}_gold"]) == [(1, 3, 3), (2, 3, 33), (3, 3, 63)]
    # the sink's txn protocol holds one commit per drained epoch —
    # replays were SKIPPED by the storage engine, not re-filtered
    assert dst.read().count() == 9


def test_versionedtxn_sink_rejects_batch_flow(spark, tmp_path):
    from pyspark import pipelines as dp

    p = _p()

    def define():
        dp.create_sink(
            name=f"{p}_hop",
            format="versionedtxn",
            options={"path": str(tmp_path / "d")},
        )

        @dp.append_flow(target=f"{p}_hop")
        def feed():
            return spark.range(3)

    with pytest.raises(ValueError, match="streaming flows only"):
        run_pipeline(spark, define, str(tmp_path / "sdp"))
