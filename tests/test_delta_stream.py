"""deltastream: Structured Streaming over a REAL Delta log
(sources/delta_stream.py) — delta-spark's readStream semantics
without delta-spark: initial snapshot (DV masks applied), append
tail, refusal on data-changing commits, skipChangeCommits /
ignoreDeletes / startingVersion options, partitionValues injection,
checkpoint-floor snapshot resolution."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.delta_stream import DeltaStreamDataSource
from etl_deltalake_spark.sources.versioned import versioned_table


@pytest.fixture
def vt(spark, tmp_path):
    spark.dataSource.register(DeltaStreamDataSource)
    return versioned_table(spark, str(tmp_path / "tbl"), use_delta=False)


def _df(spark, rows, ddl="id long"):
    return spark.createDataFrame(rows, ddl).coalesce(1)


def _drain(spark, path, out, ckp, **options):
    reader = spark.readStream.format("deltastream").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _got(spark, out):
    return sorted(
        (r.id, r._commit_version) for r in spark.read.parquet(out).collect()
    )


def test_initial_snapshot_masks_and_tail_appends(spark, vt, tmp_path):
    vt.write(_df(spark, [(i,) for i in range(10)]),
             timestamp="2026-01-01T00:00:00")
    vt.delete_where(F.col("id") < 3, timestamp="2026-01-02T00:00:00",
                    use_dv=True)
    vt.write(_df(spark, [(100,), (101,)]), timestamp="2026-01-03T00:00:00")
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, vt.path, out, ckp)
    # ONE initial batch: the current snapshot (delta version 2), DV
    # masks applied — deleted ids never reach downstream
    assert _got(spark, out) == [(i, 2) for i in range(3, 10)] + [
        (100, 2), (101, 2),
    ]
    # tail: a later append streams exactly once across a restart
    vt.write(_df(spark, [(200,)]), timestamp="2026-01-04T00:00:00")
    _drain(spark, vt.path, out, ckp)
    _drain(spark, vt.path, out, ckp)  # replay drain adds nothing
    assert _got(spark, out) == [(i, 2) for i in range(3, 10)] + [
        (100, 2), (101, 2), (200, 3),
    ]


def test_change_commit_refuses_then_skips(spark, vt, tmp_path):
    vt.write(_df(spark, [(1,), (2,)]), timestamp="2026-01-01T00:00:00")
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, vt.path, out, ckp)
    vt.delete_where(F.col("id") == 1, timestamp="2026-01-02T00:00:00",
                    use_dv=True)
    vt.write(_df(spark, [(3,)]), timestamp="2026-01-03T00:00:00")
    with pytest.raises(Exception, match="removes or rewrites"):
        _drain(spark, vt.path, out, ckp)
    _drain(spark, vt.path, out, ckp, skipChangeCommits="true")
    got = _got(spark, out)
    assert (3, 2) in got
    assert not any(v == 1 for _, v in got)  # DV commit skipped whole


def test_starting_version_replays_history(spark, vt, tmp_path):
    vt.write(_df(spark, [(1,)]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2,)]), timestamp="2026-01-02T00:00:00")
    out, ckp = str(tmp_path / "o1"), str(tmp_path / "c1")
    _drain(spark, vt.path, out, ckp, startingVersion="0")
    # full history: each row tagged with ITS commit version, no
    # snapshot batch
    assert _got(spark, out) == [(1, 0), (2, 1)]
    # startingVersion=latest: nothing until a new commit lands (the
    # sink may still write an empty batch file)
    out2, ckp2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(spark, vt.path, out2, ckp2, startingVersion="latest")
    assert spark.read.parquet(out2).count() == 0
    vt.write(_df(spark, [(9,)]), timestamp="2026-01-03T00:00:00")
    _drain(spark, vt.path, out2, ckp2, startingVersion="latest")
    assert _got(spark, out2) == [(9, 2)]


def test_foreign_partitioned_table_injects_values(spark, tmp_path):
    """A foreign log whose partition column lives only in
    partitionValues (real writers never store it in the files)."""
    spark.dataSource.register(DeltaStreamDataSource)
    root = str(tmp_path / "ft")
    os.makedirs(f"{root}/p=7")
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{root}/tmp")
    (name,) = [
        f for f in os.listdir(f"{root}/tmp") if f.startswith("part-")
    ]
    os.rename(f"{root}/tmp/{name}", f"{root}/p=7/{name}")
    schema = spark.createDataFrame([], "id long, p int").schema
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "ft",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ["p"],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"p=7/{name}",
                "partitionValues": {"p": "7"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, root, out, ckp)
    rows = sorted(
        (r.id, r.p, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, 7, 0), (2, 7, 0)]


def test_delete_only_commit_needs_ignore_deletes(spark, vt, tmp_path):
    """A foreign remove-only commit (e.g. a partition drop): refused
    by default, skipped under ignoreDeletes."""
    vt.write(_df(spark, [(1,)]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2,)]), timestamp="2026-01-02T00:00:00")
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, vt.path, out, ckp)
    snap = DL.delta_snapshot(spark, vt.path)
    victim = snap["files"][0]
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    with open(f"{root}/_delta_log/{2:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "remove": {
                        "path": victim,
                        "deletionTimestamp": 1,
                        "dataChange": True,
                    }
                }
            )
        )
    with pytest.raises(Exception, match="ignoreDeletes"):
        _drain(spark, vt.path, out, ckp)
    _drain(spark, vt.path, out, ckp, ignoreDeletes="true")
    assert _got(spark, out) == [(1, 1), (2, 1)]  # nothing new emitted


def test_column_mapping_refused(spark, tmp_path):
    spark.dataSource.register(DeltaStreamDataSource)
    root = str(tmp_path / "cm")
    schema = spark.createDataFrame([], "id long").schema
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping"],
            }
        },
        {
            "metaData": {
                "id": "cm",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    with pytest.raises(Exception, match="column mapping"):
        _drain(spark, root, out, ckp)


def test_schema_evolution_null_fills(spark, vt, tmp_path):
    vt.write(_df(spark, [(1, "a")], "id long, val string"),
             timestamp="2026-01-01T00:00:00")
    vt.write(
        _df(spark, [(2, "b", 1.5)], "id long, val string, score double"),
        timestamp="2026-01-02T00:00:00",
        merge_schema=True,
    )
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, vt.path, out, ckp, startingVersion="0")
    rows = sorted(
        (r.id, r.val, r.score, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, "a", None, 0), (2, "b", 1.5, 1)]


def test_snapshot_resolves_from_checkpoint_after_cleanup(
    spark, vt, tmp_path
):
    for i in range(12):
        vt.write(_df(spark, [(i,)]),
                 timestamp=f"2026-01-{i + 1:02d}T00:00:00")
    assert DL.cleanup_log(spark, vt.path) > 0
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    _drain(spark, vt.path, out, ckp)
    assert [i for i, _ in _got(spark, out)] == list(range(12))
    # history below the retained tail is gone: startingVersion=0 must
    # refuse, not silently resume from the checkpoint
    with pytest.raises(Exception, match="log retention"):
        _drain(
            spark, vt.path, str(tmp_path / "o2"), str(tmp_path / "c2"),
            startingVersion="0",
        )
