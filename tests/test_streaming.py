"""Structured Streaming pipelines vs their batch twins.

Each streaming query drains the sf0.001 events fixture with
``trigger(availableNow=True)`` and must reproduce the batch plan's
result exactly (same expressions → same rows).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from etl_deltalake_spark.streaming import pipeline as P

try:  # transformWithStateInPandas speaks protobuf to the state server
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return P.read_events_stream(spark, sf_dir, sf_dir)


@pytest.fixture()
def ckpt():
    d = tempfile.mkdtemp(prefix="sgraft_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _canon(rows, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream, ckpt):
    from etl_deltalake_spark.plans.queries_ext import q_tumbling_window

    got = P.run_available_now(
        P.tumbling_counts(events_stream), ckpt, output_mode="complete"
    )
    want = q_tumbling_window(spark, sf_dir).collect()
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_stream_matches_batch(spark, sf_dir, events_stream, ckpt):
    from etl_deltalake_spark.plans.queries_ext import q_session_window

    got = P.run_available_now(
        P.session_counts(events_stream), ckpt, output_mode="complete"
    )
    want = q_session_window(spark, sf_dir).collect()
    cols = ["user_id", "session_start", "session_end", "n"]
    assert _canon(got, cols) == _canon(want, cols)


def test_dedup_stream(spark, sf_dir, events_stream, ckpt):
    from etl_deltalake_spark.sources.catalog import load_table

    got = P.run_available_now(P.dedup_stream(events_stream), ckpt)
    n_distinct = load_table(spark, "events", sf_dir).select("event_id").distinct().count()
    assert len(got) == n_distinct


def test_stateful_running_totals(spark, sf_dir, events_stream, ckpt):
    from pyspark.sql import functions as F

    from etl_deltalake_spark.sources.catalog import load_table

    got = P.run_available_now(
        P.user_running_totals(events_stream), ckpt, output_mode="update"
    )
    # One update row per user per micro-batch; the LAST row per user
    # must equal the batch per-user totals (exact integer-cents sum).
    final = {}
    for r in got:
        final[r["user_id"]] = r
    want = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .collect()
    )
    assert len(final) == len(want)
    for r in want:
        g = final[r["user_id"]]
        assert g["n_events"] == r["n_events"]
        assert abs(g["total_value"] - r["total_value"]) < 1e-9


def test_stream_stream_join_matches_batch(spark, sf_dir, events_stream, ckpt):
    """Stream-stream inner join with watermarked, time-bounded state
    must equal the identical batch join (withWatermark is a no-op on
    batch frames, so the same function serves both)."""
    from etl_deltalake_spark.sources.catalog import load_table

    got = P.run_available_now(
        P.click_purchase_join(events_stream), ckpt, output_mode="append"
    )
    want = P.click_purchase_join(load_table(spark, "events", sf_dir)).collect()
    cols = ["user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"]
    assert len(got) > 0
    assert _canon(got, cols) == _canon(want, cols)


def test_stateful_last_event_type_is_batchwide(spark, sf_dir, events_stream, ckpt):
    """last_event_type must be the type of the user's max-ts event
    across the whole input, not an artifact of Arrow chunking
    (ADVICE r01). Asserted for users whose max ts is unique."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.sources.catalog import load_table

    got = P.run_available_now(
        P.user_running_totals(events_stream), ckpt, output_mode="update"
    )
    final = {}
    for r in got:
        final[r["user_id"]] = r["last_event_type"]
    ev = load_table(spark, "events", sf_dir)
    mx = ev.groupBy("user_id").agg(F.max("ts").alias("mts"))
    at_max = (
        ev.join(mx, "user_id")
        .filter(F.col("ts") == F.col("mts"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.first("event_type").alias("t"),
        )
        .filter(F.col("n_at_max") == 1)
        .collect()
    )
    assert at_max, "fixture has no user with a unique max-ts event"
    for r in at_max:
        assert final[r["user_id"]] == r["t"], r["user_id"]


def test_sliding_counts_runs(spark, events_stream, ckpt):
    got = P.run_available_now(
        P.sliding_counts(events_stream), ckpt, output_mode="complete"
    )
    assert len(got) > 0


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas needs the protobuf package "
    "(state-server protocol); not installed in this container",
)
def test_transform_with_state_anomaly_monitor(spark, sf_dir, events_stream, ckpt):
    """transformWithStateInPandas runner: final per-user row must
    carry the exact batch-computed running stats (integer-cents
    state is order-insensitive), and the anomaly count is bounded
    by the event count."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.sources.catalog import load_table

    got = P.run_available_now(
        P.user_anomaly_stats(events_stream, z_threshold=2.0),
        ckpt,
        output_mode="update",
    )
    assert got, "no output rows"
    final = {}
    for r in got:
        final[r["user_id"]] = r
    want = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
                / F.count(F.lit(1))
            ).alias("mean_value"),
        )
        .collect()
    )
    assert len(final) == len(want)
    for r in want:
        g = final[r["user_id"]]
        assert g["n_events"] == r["n_events"]
        assert abs(g["mean_value"] - r["mean_value"]) < 1e-9
        assert 0 <= g["n_anomalies"] <= g["n_events"]
        if g["n_events"] >= 2:
            assert g["std_value"] is not None and g["std_value"] >= 0.0


def test_rollup_maintenance_stream_multi_epoch(spark, sf_dir):
    """The foreachBatch rollup maintenance must actually sequence
    MULTIPLE epochs (one per source file) and its final merged state
    must equal a one-shot recompute bitwise."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.rollups import rollup_result, rollup_state
    from etl_deltalake_spark.sources.catalog import load_table
    from etl_deltalake_spark.streaming.pipeline import rollup_maintenance_stream

    src = tempfile.mkdtemp(prefix="sgraft_rollup_t_src_")
    ev = load_table(spark, "events", sf_dir)
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state_dir = tempfile.mkdtemp(prefix="sgraft_rollup_t_state_")
    ckpt = tempfile.mkdtemp(prefix="sgraft_rollup_t_ckpt_")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/part0").schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    final = rollup_maintenance_stream(
        stream, ["event_type"], "value", state_dir, ckpt
    )
    versions = sorted(d for d in os.listdir(state_dir) if d.startswith("v"))
    assert len(versions) == 3, f"expected 3 epochs, got {versions}"
    assert final.endswith(versions[-1])
    maintained = sorted(
        tuple(r)
        for r in rollup_result(spark.read.parquet(final)).collect()
    )
    oneshot = sorted(
        tuple(r)
        for r in rollup_result(
            rollup_state(ev, ["event_type"], "value")
        ).collect()
    )
    assert maintained == oneshot


def test_httpjson_stream_source_incremental_pages(spark, tmp_path):
    """The custom Python DataSource's STREAM leg (round 8,
    sources/http_source.HttpJsonStreamReader): page-number offsets —
    batch 1 consumes the pages that exist, newly published pages
    arrive in the next trigger exactly once, already-read pages are
    never re-fetched into the sink."""
    import json as _json

    from pyspark.sql import functions as F

    from etl_deltalake_spark.sources.http_source import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)

    def publish(page, ids):
        (tmp_path / f"page_{page}.json").write_text(
            _json.dumps({"data": [{"id": i} for i in ids]})
        )

    publish(0, [10, 11])
    publish(1, [20])
    tmpl = f"file://{tmp_path}/page_{{page}}.json"
    stream = (
        spark.readStream.format("httpjson")
        .option("url_template", tmpl)
        .option("fields", "id")
        .option("data_key", "data")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("httpjson_sink")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["id"]
            for r in spark.sql("SELECT id FROM httpjson_sink").collect()
        }
        assert got == {"10", "11", "20"}
        publish(2, [30, 31])
        q.processAllAvailable()
        rows = spark.sql("SELECT id, _src FROM httpjson_sink").collect()
        assert {r["id"] for r in rows} == {"10", "11", "20", "30", "31"}
        # exactly-once: no page re-fetched into the sink
        assert len(rows) == 5
        srcs = {r["_src"] for r in rows}
        assert any(s.endswith("page_2.json") for s in srcs)
    finally:
        q.stop()


def test_httpjson_stream_source_restart_from_checkpoint(spark, tmp_path):
    """Exactly-once must hold ACROSS RESTARTS: stop the query, publish
    more pages, start a NEW query on the same checkpoint — the second
    run must deliver only the unseen pages, no re-reads, no gaps."""
    import json as _json

    from etl_deltalake_spark.sources.http_source import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)

    def publish(page, ids):
        (tmp_path / f"pg_{page}.json").write_text(
            _json.dumps({"data": [{"id": i} for i in ids]})
        )

    publish(0, [1, 2])
    tmpl = f"file://{tmp_path}/pg_{{page}}.json"

    out = str(tmp_path / "sink2")

    def start():
        # memory sinks don't support recovery; the json FILE sink does
        return (
            spark.readStream.format("httpjson")
            .option("url_template", tmpl)
            .option("fields", "id")
            .option("data_key", "data")
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )

    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert {
        r["id"] for r in spark.read.json(out).collect()
    } == {"1", "2"}

    publish(1, [3])
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    ids = [r["id"] for r in spark.read.json(out).collect()]
    # exactly-once across the restart: page 0 NOT re-delivered
    assert sorted(ids) == ["1", "2", "3"]
