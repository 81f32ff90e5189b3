"""Delta-protocol conformance for the VersionedTable mirror
(sources/delta_log.py, round 9 — VERDICT r8 Next #4): every commit
must ALSO land as real ``_delta_log/%020d.json`` actions + interval
parquet checkpoints, readable by any spec reader (PROTOCOL.md at
github.com/delta-io/delta) with no VersionedTable machinery.

The in-test verifier is the INDEPENDENT spec replay in
delta_log.delta_snapshot (latest-metaData-wins, adds minus removes) —
plus raw-JSON golden checks so the action shapes themselves are
pinned, not just the replay outcome. delta-spark and DuckDB's delta
extension are unobtainable in-container (the repo's two standing env
skips), so an external-engine read is attempted and env-skipped.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.versioned import versioned_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _df(spark, pairs):
    return spark.createDataFrame(pairs, ["id", "val"])


@pytest.fixture()
def vt(spark, tmp_path):
    return versioned_table(spark, str(tmp_path / "dl"), use_delta=False)


def _log_files(vt):
    import os

    d = f"{vt.path}/_delta_log"
    if not os.path.isdir(d):
        return []
    return sorted(os.listdir(d))


def test_first_commit_emits_protocol_and_metadata(spark, vt):
    vt.write(_df(spark, [(1, "a"), (2, "b")]), timestamp="2026-01-01T00:00:00")
    path = f"{vt.path}/_delta_log/{0:020d}.json"
    with open(path, encoding="utf-8") as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    proto = actions[0]["protocol"]
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = actions[1]["metaData"]
    # schemaString is a REAL Spark StructType JSON round-trippable to
    # the written schema
    from pyspark.sql.types import StructType

    st = StructType.fromJson(json.loads(meta["schemaString"]))
    assert [(f.name, f.dataType.simpleString()) for f in st.fields] == [
        ("id", "bigint"),
        ("val", "string"),
    ]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    assert meta["id"] == DL.table_id(vt.path)  # deterministic + stable
    adds = [a["add"] for a in actions if "add" in a]
    assert adds, "first commit must add files"
    import os

    for add in adds:
        full = f"{vt.path}/{add['path']}"
        assert os.path.isfile(full), add
        assert add["size"] == os.path.getsize(full)
        assert add["dataChange"] is True
        assert add["partitionValues"] == {}
        # caller-timestamp determinism: 2026-01-01T00:00:00Z in millis
        assert add["modificationTime"] == 1767225600000


def test_every_commit_mirrors_and_versions_are_gapless(spark, vt):
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-01-02T00:00:00")
    vt.write(
        _df(spark, [(9, "z")]), mode="overwrite",
        timestamp="2026-01-03T00:00:00",
    )
    names = [n for n in _log_files(vt) if n.endswith(".json")]
    assert names == [f"{v:020d}.json" for v in range(3)]


def test_overwrite_emits_removes_for_every_prior_live_file(spark, vt):
    vt.write(_df(spark, [(1, "a"), (2, "b")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-01-02T00:00:00")
    snap_before = DL.delta_snapshot(spark, vt.path)
    vt.write(
        _df(spark, [(9, "z")]), mode="overwrite",
        timestamp="2026-01-03T00:00:00",
    )
    with open(f"{vt.path}/_delta_log/{2:020d}.json", encoding="utf-8") as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    removed = sorted(a["remove"]["path"] for a in actions if "remove" in a)
    assert removed == snap_before["files"]
    for a in actions:
        if "remove" in a:
            assert a["remove"]["dataChange"] is True
            assert a["remove"]["deletionTimestamp"] == 1767398400000


def test_spec_replay_matches_versioned_read_through_dml(spark, vt):
    """The independent protocol replay (read_delta — never touches the
    custom log) must materialize the same rows as VersionedTable.read
    after append / overwrite / MERGE / UPDATE / DELETE."""
    vt.write(_df(spark, [(1, "a"), (2, "b")]), timestamp="2026-01-01T00:00:00")
    vt.upsert(
        _df(spark, [(2, "B"), (3, "c")]), ["id"],
        timestamp="2026-01-02T00:00:00",
    )
    vt.update_where(
        F.col("id") == 1, {"val": F.lit("A")},
        timestamp="2026-01-03T00:00:00",
    )
    vt.delete_where(F.col("id") == 3, timestamp="2026-01-04T00:00:00")
    expected = _rows(vt.read())
    assert expected == [(1, "A"), (2, "B")]
    assert _rows(DL.read_delta(spark, vt.path)) == expected
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["protocol"] == {"minReaderVersion": 1, "minWriterVersion": 2}
    # live-file sets agree exactly (path-keyed adds minus removes)
    live_custom = sorted(
        f[len(vt.path) + 1:] for f in vt._snapshot_files()[0]
    )
    assert snap["files"] == live_custom


def test_metadata_reemitted_only_on_schema_change(spark, vt):
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-01-02T00:00:00")
    wide = spark.createDataFrame([(1, "a", 0.5)], ["id", "val", "score"])
    vt.write(wide, mode="overwrite", timestamp="2026-01-03T00:00:00")
    metas = {
        v: a["metaData"]
        for v, a in DL.delta_log_actions(spark, vt.path)
        if "metaData" in a
    }
    assert sorted(metas) == [0, 2]  # same-schema append emits none
    assert metas[0]["id"] == metas[2]["id"]  # table id is stable
    assert "score" in metas[2]["schemaString"]
    # replay resolves the LATEST schema
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["schema_json"] == metas[2]["schemaString"]


def test_checkpoint_parquet_and_last_checkpoint(spark, vt):
    for i in range(10):  # custom v10 = delta v9 → checkpoint
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    names = _log_files(vt)
    assert f"{9:020d}.checkpoint.parquet" in names
    assert "_last_checkpoint" in names
    with open(f"{vt.path}/_delta_log/_last_checkpoint", encoding="utf-8") as f:
        ptr = json.load(f)
    assert ptr["version"] == 9
    ck = spark.read.parquet(
        f"{vt.path}/_delta_log/{9:020d}.checkpoint.parquet"
    )
    assert ptr["size"] == ck.count()
    cols = set(ck.columns)
    assert {"protocol", "metaData", "add"} <= cols
    # exactly one protocol row, one metaData row, one add per live file
    assert ck.filter(F.col("protocol").isNotNull()).count() == 1
    assert ck.filter(F.col("metaData").isNotNull()).count() == 1
    adds = sorted(
        r["add"]["path"]
        for r in ck.filter(F.col("add").isNotNull()).collect()
    )
    assert adds == DL.delta_snapshot(spark, vt.path)["files"]
    # checkpoint metaData round-trips to the live schema
    meta_row = ck.filter(F.col("metaData").isNotNull()).collect()[0]
    from pyspark.sql.types import StructType

    st = StructType.fromJson(json.loads(meta_row["metaData"]["schemaString"]))
    assert [f.name for f in st.fields] == ["id", "val"]


def test_backfill_upgrades_pre_round9_tables(spark, vt):
    """A table whose early commits predate the mirror gains a gapless
    _delta_log on its next write."""
    import shutil

    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-01-02T00:00:00")
    shutil.rmtree(f"{vt.path}/_delta_log")  # simulate a pre-r9 table
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-01-03T00:00:00")
    names = [n for n in _log_files(vt) if n.endswith(".json")]
    assert names == [f"{v:020d}.json" for v in range(3)]
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())
    # backfilled v0 carries protocol + metaData like a native v0
    kinds = [
        next(iter(a))
        for v, a in DL.delta_log_actions(spark, vt.path)
        if v == 0
    ]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"


def test_external_delta_reader_if_available(spark, vt):
    """Full interop proof needs an external engine; both candidate
    readers are env-absent in this container (the repo's standing
    delta-spark skip; DuckDB's delta extension needs a network
    INSTALL). Attempt DuckDB and skip honestly when unavailable."""
    import duckdb

    vt.write(_df(spark, [(1, "a"), (2, "b")]), timestamp="2026-01-01T00:00:00")
    con = duckdb.connect()
    try:
        con.execute("INSTALL delta; LOAD delta")
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"duckdb delta extension unavailable: {e}")
    rows = con.execute(
        f"SELECT id, val FROM delta_scan('{vt.path}') ORDER BY id"
    ).fetchall()
    assert rows == [(1, "a"), (2, "b")]


def test_read_external_partitioned_delta_table(spark, tmp_path):
    """read_delta must handle a table written by a FOREIGN Delta
    writer: partition values live in the log's partitionValues (the
    parquet files do NOT contain the partition column) and must be
    injected as typed columns per the metaData schema."""
    import os

    root = str(tmp_path / "ext")
    os.makedirs(f"{root}/_delta_log")
    # two "foreign" part files, partition column `p` absent on disk
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "val"])
    b = spark.createDataFrame([(3, "z")], ["id", "val"])
    a.coalesce(1).write.parquet(f"{root}/p=1/f")
    b.coalesce(1).write.parquet(f"{root}/p=2/f")

    def one_part(d):
        files = [
            f for f in os.listdir(f"{root}/{d}") if f.startswith("part-")
        ]
        assert len(files) == 1
        return f"{d}/{files[0]}"

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("val", StringType()),
            StructField("p", IntegerType()),
        ]
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "abc",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ["p"],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": one_part("p=1/f"),
                "partitionValues": {"p": "1"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
        {
            "add": {
                "path": one_part("p=2/f"),
                "partitionValues": {"p": "2"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w", encoding="utf-8") as f:
        f.write("\n".join(json.dumps(x) for x in actions))

    got = DL.read_delta(spark, root)
    assert got.columns == ["id", "val", "p"]
    assert dict(got.dtypes)["p"] == "int"
    assert _rows(got) == [(1, "x", 1), (2, "y", 1), (3, "z", 2)]


def test_snapshot_resolves_from_checkpoint_after_log_cleanup(spark, vt):
    """Real Delta writers DELETE old JSON log files once a checkpoint
    covers them — a spec reader must resolve from _last_checkpoint +
    the JSON tail alone. Build 12 commits (checkpoint at delta v9),
    delete JSON 0..9, and require identical rows and live files."""
    import os

    for i in range(12):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-02-{i + 1:02d}T00:00:00",
        )
    before = _rows(DL.read_delta(spark, vt.path))
    for v in range(10):
        os.remove(f"{vt.path}/_delta_log/{v:020d}.json")
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["version"] == 11
    assert _rows(DL.read_delta(spark, vt.path)) == before == _rows(vt.read())


def test_delta_snapshot_reads_are_o_of_tail(spark, vt, monkeypatch):
    """The Delta-side metadata story mirrors the custom log's pinned
    O(interval) resolution: with a checkpoint at delta v9 and 13
    commits, delta_snapshot must read only the _last_checkpoint
    pointer + the 3 post-checkpoint JSON files (versions 10..12) —
    commit files at or below the checkpoint are skipped BY FILENAME,
    zero reads (the parquet checkpoint itself goes through
    spark.read, not _read_small_file)."""
    from etl_deltalake_spark.sources import versioned as V

    for i in range(13):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-03-{i + 1:02d}T00:00:00",
        )
    expected = _rows(DL.read_delta(spark, vt.path))
    reads = {"n": 0}
    real = V._read_small_file

    def counting(spark_, path):
        reads["n"] += 1
        return real(spark_, path)

    monkeypatch.setattr(V, "_read_small_file", counting)
    snap = DL.delta_snapshot(spark, vt.path)
    assert reads["n"] <= 4, reads["n"]  # pointer + 3 tail JSONs
    assert snap["version"] == 12
    assert _rows(DL.read_delta(spark, vt.path)) == expected


def test_cleanup_log_retention(spark, vt):
    """cleanup_log deletes JSON commits below the newest checkpoint;
    the spec reader still resolves, and the CUSTOM log keeps full
    time travel."""
    for i in range(12):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-04-{i + 1:02d}T00:00:00",
        )
    before = _rows(DL.read_delta(spark, vt.path))
    n = DL.cleanup_log(spark, vt.path)
    assert n == 9  # delta versions 0..8 (checkpoint at 9 kept)
    names = [x for x in _log_files(vt) if x.endswith(".json")]
    assert names == [f"{v:020d}.json" for v in (9, 10, 11)]
    assert _rows(DL.read_delta(spark, vt.path)) == before
    # custom-log history intact: time travel below the checkpoint
    assert _rows(vt.read(version=3)) == [(i, f"r{i}") for i in range(3)]
    # idempotent
    assert DL.cleanup_log(spark, vt.path) == 0


def test_add_actions_carry_file_stats(spark, vt):
    """Each add action carries the Delta ``stats`` JSON (numRecords /
    minValues / maxValues from the parquet footer — the file-skipping
    metadata spec readers prune with), and the values match the
    file's actual contents."""
    vt.write(
        spark.createDataFrame(
            [(5, "m"), (1, "a"), (9, "z")], ["id", "val"]
        ),
        timestamp="2026-05-01T00:00:00",
    )
    with open(f"{vt.path}/_delta_log/{0:020d}.json", encoding="utf-8") as f:
        adds = [
            json.loads(ln)["add"] for ln in f if '"add"' in ln
        ]
    assert adds
    total = 0
    lows, highs = [], []
    for a in adds:
        assert "stats" in a, a
        st = json.loads(a["stats"])
        assert st["numRecords"] >= 0
        total += st["numRecords"]
        if st["numRecords"]:
            lows.append(st["minValues"]["id"])
            highs.append(st["maxValues"]["id"])
            assert set(st["minValues"]) == {"id", "val"}
    assert total == 3
    assert min(lows) == 1 and max(highs) == 9


def test_stats_based_file_pruning(spark, vt):
    """pruned_files skips files whose stats range cannot intersect
    the predicate — disjoint-range commits land in different files,
    and only the overlapping ones survive."""
    for base in (0, 100, 200):
        vt.write(
            spark.createDataFrame(
                [(base + i, f"v{base + i}") for i in range(3)],
                ["id", "val"],
            ),
            timestamp=f"2026-06-0{base // 100 + 1}T00:00:00",
        )
    keep, skipped = DL.pruned_files(spark, vt.path, "id", lo=100, hi=102)
    assert skipped >= 2  # the 0- and 200- commits cannot match
    got = sorted(
        r["id"]
        for r in spark.read.parquet(
            *[f"{vt.path}/{p}" for p in keep]
        ).collect()
    )
    assert {100, 101, 102} <= set(got)
    assert all(100 <= v <= 102 for v in got) or True  # pruning, not filtering


def test_txn_exactly_once_replay(spark, vt):
    """The Delta txn pattern end-to-end: a committed (app_id, batch)
    replayed — the crash-after-commit-before-checkpoint window, or a
    duplicate foreachBatch invocation — must be a no-op: no new
    version, no duplicate rows; the txn action lands in the mirror
    log; an unrelated app's same version number still commits."""
    from etl_deltalake_spark.streaming.pipeline import (
        exactly_once_versioned_sink,
    )

    sink = exactly_once_versioned_sink(vt, "appA")
    b0 = _df(spark, [(1, "a"), (2, "b")])
    b1 = _df(spark, [(3, "c")])
    sink(b0, 0)
    sink(b1, 1)
    assert _rows(vt.read()) == [(1, "a"), (2, "b"), (3, "c")]
    v_before = vt.latest_version()
    sink(b1, 1)  # replayed batch
    sink(b0, 0)  # out-of-order replay
    assert vt.latest_version() == v_before
    assert _rows(vt.read()) == [(1, "a"), (2, "b"), (3, "c")]
    assert vt.last_txn_version("appA") == 1
    # a different app is independent
    other = exactly_once_versioned_sink(vt, "appB")
    other(_df(spark, [(9, "z")]), 1)
    assert _rows(vt.read()) == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]
    assert vt.last_txn_version("appB") == 1
    # txn actions are visible to spec readers in the mirror
    txns = [
        a["txn"]
        for _, a in DL.delta_log_actions(spark, vt.path)
        if "txn" in a
    ]
    assert {(t["appId"], t["version"]) for t in txns} == {
        ("appA", 0), ("appA", 1), ("appB", 1),
    }
    # and read_delta agrees with the table
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())


def test_versionedcdf_stream_reads_each_commit_once(spark, vt, tmp_path):
    """The streaming CDF source: availableNow over a 3-version table
    yields every added row exactly once with its _change_version;
    after MORE commits land, a restart from the same checkpoint
    consumes only the new versions (engine-managed offsets = table
    versions)."""
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    for i in range(3):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-07-{i + 1:02d}T00:00:00",
        )
    ckpt = str(tmp_path / "cdf_ckpt")
    out = str(tmp_path / "cdf_out")

    def drain():
        q = (
            spark.readStream.format("versionedcdf")
            .option("path", vt.path)
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = spark.read.json(out)
    rows = sorted(
        (r["id"], r["val"], r["_change_version"]) for r in got.collect()
    )
    assert rows == [(0, "r0", 1), (1, "r1", 2), (2, "r2", 3)]

    # new commits stream incrementally after a restart — old versions
    # are NOT re-read (exactly-once via the engine checkpoint)
    vt.write(_df(spark, [(3, "r3")]), timestamp="2026-07-04T00:00:00")
    vt.write(_df(spark, [(4, "r4")]), timestamp="2026-07-05T00:00:00")
    drain()
    rows = sorted(
        (r["id"], r["val"], r["_change_version"])
        for r in spark.read.json(out).collect()
    )
    assert rows == [
        (0, "r0", 1), (1, "r1", 2), (2, "r2", 3),
        (3, "r3", 4), (4, "r4", 5),
    ]


def test_versionedcdf_roundtrip_with_exactly_once_sink(spark, vt, tmp_path):
    """The full streaming hop: versionedcdf source → foreachBatch →
    exactly_once_versioned_sink into a SECOND versioned table; a
    duplicate drain adds nothing downstream."""
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )
    from etl_deltalake_spark.sources.versioned import versioned_table
    from etl_deltalake_spark.streaming.pipeline import (
        exactly_once_versioned_sink,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    vt.write(_df(spark, [(1, "a"), (2, "b")]), timestamp="2026-07-01T00:00:00")
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-07-02T00:00:00")
    dst = versioned_table(spark, str(tmp_path / "dst"), use_delta=False)
    ckpt = str(tmp_path / "hop_ckpt")
    sink = exactly_once_versioned_sink(dst, "hop")

    def drain():
        q = (
            spark.readStream.format("versionedcdf")
            .option("path", vt.path)
            .load()
            .drop("_change_version")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert _rows(dst.read()) == [(1, "a"), (2, "b"), (3, "c")]
    v = dst.latest_version()
    drain()  # no new upstream versions → no downstream commits
    assert dst.latest_version() == v
    assert _rows(dst.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_backfill_respects_checkpoint_floor(spark, vt):
    """Round-10 regression (ADVICE r9): after cleanup_log deletes the
    JSON commits a checkpoint covers, the NEXT write must not re-emit
    them — retention has to stick, or every later commit pays
    O(full-history) driver writes and resurrects vacuumed files as
    size-0 adds. The _last_checkpoint pointer is the backfill floor."""
    for i in range(12):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-05-{i + 1:02d}T00:00:00",
        )
    assert DL.cleanup_log(spark, vt.path) == 9  # delta 0..8 gone
    vt.write(_df(spark, [(99, "new")]), timestamp="2026-05-13T00:00:00")
    names = [x for x in _log_files(vt) if x.endswith(".json")]
    # only the tail (9..12) — nothing below the checkpoint came back
    assert names == [f"{v:020d}.json" for v in (9, 10, 11, 12)]
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())
    # and retention keeps sticking on the round after
    vt.write(_df(spark, [(100, "newer")]), timestamp="2026-05-14T00:00:00")
    names = [x for x in _log_files(vt) if x.endswith(".json")]
    assert names[0] == f"{9:020d}.json"


def test_checkpoint_carries_txn_and_tombstones(spark, vt):
    """Round-10 regression (ADVICE r9): PROTOCOL.md checkpoints hold
    the COMPLETE replay state — after cleanup_log, a spec reader
    resolving from the checkpoint alone must still see (a) each
    appId's latest txn version (exactly-once lookups) and (b) remove
    tombstones for deleted-but-unexpired files."""
    for i in range(3):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-06-{i + 1:02d}T00:00:00",
        )
    overwritten = DL.delta_snapshot(spark, vt.path)["files"]
    # overwrite → every prior live file becomes a tombstone
    vt.write(
        _df(spark, [(10, "ow")]),
        mode="overwrite",
        timestamp="2026-06-04T00:00:00",
    )
    vt.write(
        _df(spark, [(11, "t")]),
        timestamp="2026-06-05T00:00:00",
        txn=("appX", 7),
    )
    for i in range(5):  # commits 6..10; v10 checkpoints at delta 9
        vt.write(
            _df(spark, [(20 + i, f"s{i}")]),
            timestamp=f"2026-06-{6 + i:02d}T00:00:00",
        )
    assert DL.cleanup_log(spark, vt.path) == 9
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["txns"] == {"appX": 7}
    ck = spark.read.parquet(
        f"{vt.path}/_delta_log/{9:020d}.checkpoint.parquet"
    )
    removes = [
        r["remove"].asDict() for r in ck.collect() if r["remove"] is not None
    ]
    assert sorted(rm["path"] for rm in removes) == overwritten
    from datetime import datetime, timezone

    ow_millis = int(
        datetime(2026, 6, 4, tzinfo=timezone.utc).timestamp() * 1000
    )
    for rm in removes:
        assert rm["deletionTimestamp"] == ow_millis
        assert rm["dataChange"] is True
        assert rm["path"] not in snap["files"]
    txn_rows = [
        r["txn"].asDict() for r in ck.collect() if r["txn"] is not None
    ]
    assert [(t["appId"], t["version"]) for t in txn_rows] == [("appX", 7)]
    # the table still reads correctly through the spec path
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())


def test_read_delta_null_partition_values(spark, tmp_path):
    """Round-10 regression (ADVICE r9): foreign tables may carry NULL
    partitionValues (Hive __HIVE_DEFAULT_PARTITION__ semantics);
    sorting partition groups must not compare None < str."""
    import os

    root = str(tmp_path / "extnull")
    os.makedirs(f"{root}/_delta_log")
    a = spark.createDataFrame([(1, "x")], ["id", "val"])
    b = spark.createDataFrame([(2, "y")], ["id", "val"])
    a.coalesce(1).write.parquet(f"{root}/p=1/f")
    b.coalesce(1).write.parquet(f"{root}/p=null/f")

    def one_part(d):
        files = [
            f for f in os.listdir(f"{root}/{d}") if f.startswith("part-")
        ]
        return f"{d}/{files[0]}"

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("val", StringType()),
            StructField("p", StringType()),
        ]
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "nullpart",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ["p"],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": one_part("p=1/f"),
                "partitionValues": {"p": "1"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
        {
            "add": {
                "path": one_part("p=null/f"),
                "partitionValues": {"p": None},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w", encoding="utf-8") as f:
        f.write("\n".join(json.dumps(x) for x in actions))
    got = DL.read_delta(spark, root)
    assert _rows(got) == [(1, "x", "1"), (2, "y", None)]


def test_versionedcdf_replays_across_schema_evolution(spark, vt, tmp_path):
    """Round-10 regression (ADVICE r9): a CDF replay from version 0
    over a mergeSchema-evolved table must surface NULLs for columns
    the older data files lack (VersionedTable.read's null-fill rule),
    not crash the Python reader on a missing parquet column."""
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-08-01T00:00:00")
    wide = spark.createDataFrame([(2, "b", 9.5)], ["id", "val", "extra"])
    vt.write(wide, timestamp="2026-08-02T00:00:00", merge_schema=True)
    out = str(tmp_path / "evo_out")
    q = (
        spark.readStream.format("versionedcdf")
        .option("path", vt.path)
        .load()
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "evo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.json(out)
    rows = sorted(
        (
            r["id"],
            r["val"],
            r["extra"] if "extra" in got.columns else None,
            r["_change_version"],
        )
        for r in got.collect()
    )
    assert rows == [(1, "a", None, 1), (2, "b", 9.5, 2)]


# ------------------------------------------------ golden conformance

# PROTOCOL.md field sets (github.com/delta-io/delta PROTOCOL.md):
# exact required keys per action — a spec reader parses by these.
_SPEC_FIELDS = {
    "protocol": {"minReaderVersion", "minWriterVersion"},
    "metaData": {
        "id", "format", "schemaString", "partitionColumns",
        "configuration", "createdTime",
    },
    "add": {"path", "partitionValues", "size", "modificationTime",
            "dataChange"},
    "remove": {"path", "deletionTimestamp", "dataChange"},
    "txn": {"appId", "version"},
    "commitInfo": {"timestamp", "operation"},
    "cdc": {"path", "partitionValues", "size", "dataChange"},
    "domainMetadata": {"domain", "configuration", "removed"},
}
_SPEC_OPTIONAL = {
    "protocol": {"readerFeatures", "writerFeatures"},
    # row tracking (round 14): adds may carry baseRowId +
    # defaultRowCommitVersion
    "add": {"stats", "deletionVector", "baseRowId",
            "defaultRowCommitVersion"},
    # removes of masked files copy the add's descriptor (round 13);
    # PROTOCOL.md also allows partitionValues/size on removes
    "remove": {"deletionVector", "partitionValues", "size"},
    "commitInfo": {"operationParameters", "engineInfo"},
}


def _golden_script(spark, vt):
    """The scripted history behind tests/data/golden_delta_log.json:
    appends, a txn commit, an overwrite, a mergeSchema append, five
    more commits so the 10th checkpoints at delta version 9, then
    (round 11) an OPTIMIZE compaction — its add/remove actions must
    carry dataChange=false — a final real append after it, and a
    merge-on-read DELETE + UPDATE (deletion vectors: the DELETE's
    commit must carry the protocol-upgrade action to reader 3 /
    writer 7 with the deletionVectors feature, and both re-add the
    masked file with a ``deletionVector`` descriptor), then (round
    12) the full DDL/layout tail: RENAME COLUMN (columnMapping
    protocol upgrade + mapped metaData), a post-rename append,
    RESTORE, DROP COLUMN, and a partitioned overwrite whose adds
    carry physical-name partitionValues and whose metaData re-emits
    the new partitionColumns."""
    def df(pairs, cols=("id", "val")):
        return spark.createDataFrame(pairs, list(cols)).coalesce(1)

    vt.write(df([(1, "a"), (2, "b")]), timestamp="2026-01-01T00:00:00")
    vt.write(df([(3, "c")]), timestamp="2026-01-02T00:00:00")
    vt.write(
        df([(4, "d")]), timestamp="2026-01-03T00:00:00", txn=("app1", 5)
    )
    vt.write(
        df([(9, "z")]), mode="overwrite", timestamp="2026-01-04T00:00:00"
    )
    vt.write(
        df([(10, "w", 1.5)], ("id", "val", "score")),
        timestamp="2026-01-05T00:00:00",
        merge_schema=True,
    )
    for i in range(5):
        vt.write(
            df([(20 + i, f"s{i}", float(i))], ("id", "val", "score")),
            timestamp=f"2026-01-{6 + i:02d}T00:00:00",
        )
    vt.compact(timestamp="2026-01-11T00:00:00")
    vt.write(
        df([(30, "p", 9.0)], ("id", "val", "score")),
        timestamp="2026-01-12T00:00:00",
    )
    vt.delete_where(
        F.col("id") == 20, timestamp="2026-01-13T00:00:00", use_dv=True
    )
    vt.update_where(
        F.col("id") == 30,
        {"val": F.lit("q")},
        timestamp="2026-01-14T00:00:00",
        use_dv=True,
    )
    # round 12: every remaining writer action class gets byte-pinned —
    # column-mapping DDL (rename enables mapping: metaData gains the
    # columnMapping config + per-field physicalName/id, protocol
    # gains the feature), a post-rename append (files under PHYSICAL
    # names), RESTORE (one metadata commit re-pointing the live set),
    # metadata-only DROP COLUMN, and a partitioned overwrite on the
    # mapped table (hive adds whose partitionValues key is the
    # PHYSICAL name)
    vt.rename_column("val", "label", "2026-01-15T00:00:00")
    vt.write(
        df([(40, "m", 2.5)], ("id", "label", "score")),
        mode="append",
        timestamp="2026-01-16T00:00:00",
    )
    vt.restore(15, timestamp="2026-01-17T00:00:00")
    vt.drop_column("score", "2026-01-18T00:00:00")
    vt.write(
        df([(50, "x"), (51, "x"), (52, "y")], ("id", "label")),
        mode="overwrite",
        partition_by=["label"],
        timestamp="2026-01-19T00:00:00",
    )


def _golden_script_cdf(spark, path):
    """Round-13 golden tail (VERDICT r12 #2): the action classes the
    original script never exercised — spec ``cdc`` actions (CDF
    delete/update + their ``_change_data/`` hive layout), a
    deletion-vector DML on a PARTITIONED table, removes that carry
    the removed file's ``deletionVector`` descriptor, a plain
    overwrite on a CDF table (mixed adds+removes, NO cdc — the
    derivation case), and partition values that need percent-encoding
    (a space and a literal ``%``) so the path-encoding round-trip is
    byte-pinned."""
    t = versioned_table(spark, path, use_delta=False, cdf=True)
    ddl = "id long, p string, val string"
    t.write(
        spark.createDataFrame(
            [(1, "a b", "x"), (2, "a b", "y"), (3, "100%", "z")], ddl
        ).coalesce(1),
        mode="overwrite", partition_by=["p"],
        timestamp="2026-02-01T00:00:00",
    )
    t.delete_where(
        F.col("id") == 1, timestamp="2026-02-02T00:00:00", use_dv=True
    )
    t.update_where(
        F.col("id") == 2, {"val": F.lit("Y")},
        timestamp="2026-02-03T00:00:00",
    )
    t.write(
        spark.createDataFrame([(9, "a b", "w")], ddl).coalesce(1),
        mode="overwrite", partition_by=["p"],
        timestamp="2026-02-04T00:00:00",
    )
    return t


def _golden_script_r14(spark, path):
    """Round-14 golden tail (VERDICT r13 #6 fallback): the action
    classes this round added — IDENTITY metadata
    (``delta.identity.start/step/allowExplicitInsert`` plus a
    ``highWaterMark`` that MOVES across allocating commits, each
    re-emitting metaData like real Delta), generated-column metadata
    riding the same schemaString, the identityColumns +
    generatedColumns writer-feature pair, and REORG PURGE's shape
    (removes carrying the purged file's deletionVector descriptor,
    rewritten adds with dataChange=false). The 20-commit tail crosses
    TWO checkpoint generations so ``cleanup_log``'s swept layout
    (surviving checkpoint parquets + advanced ``_last_checkpoint``)
    is byte-pinned too."""
    t = versioned_table(spark, path, use_delta=False)
    t.set_identity_column("uid", start=7, step=3)
    t.set_generated_column("twice", "id * 2")
    ddl = "id long, val string"

    def df(rows):
        return spark.createDataFrame(rows, ddl).coalesce(1)

    t.write(df([(1, "a"), (2, "b")]), timestamp="2026-05-01T00:00:00")
    t.write(df([(3, "c")]), mode="append", timestamp="2026-05-02T00:00:00")
    t.delete_where(
        F.col("id") == 1, timestamp="2026-05-03T00:00:00", use_dv=True
    )
    t.purge(timestamp="2026-05-04T00:00:00")
    for i in range(16):  # custom v5..v20 → delta checkpoints at 9, 19
        t.write(
            df([(10 + i, f"r{i}")]),
            mode="append",
            timestamp=f"2026-05-{5 + i:02d}T00:00:00",
        )
    return t


def _golden_script_r14b(spark, path):
    """Round-14 third-wave golden tail: row tracking + clustering on
    ONE table — adds carrying ``baseRowId``/``defaultRowCommitVersion``
    (fresh mints vs a DV re-add COPYING its original pair),
    ``delta.rowTracking`` domainMetadata watermark advances,
    ``delta.clustering`` domainMetadata (set → re-cluster → NONE),
    and the clustering/rowTracking/domainMetadata writer-feature
    protocol."""
    t = versioned_table(
        spark, path, use_delta=False, row_tracking=True
    )
    t.set_clustering(["id"])
    ddl = "id long, val string"

    def df(rows):
        return spark.createDataFrame(rows, ddl).coalesce(1)

    t.write(df([(1, "a"), (2, "b"), (3, "c")]),
            timestamp="2026-06-01T00:00:00")
    t.write(df([(4, "d")]), mode="append",
            timestamp="2026-06-02T00:00:00")
    # DV delete: the masked file re-adds with its ORIGINAL row ids
    t.delete_where(F.col("id") == 1,
                   timestamp="2026-06-03T00:00:00", use_dv=True)
    t.set_clustering(["val"])
    t.write(df([(5, "e")]), mode="append",
            timestamp="2026-06-04T00:00:00")
    t.set_clustering([])
    t.write(df([(6, "f")]), mode="append",
            timestamp="2026-06-05T00:00:00")
    return t


def _normalize_manifest(lines):
    """Normalized v2-named-checkpoint manifest actions: sidecar names
    are random uuids and sizes vary with parquet encoding — mask
    both; everything else (action kinds, order, checkpointMetadata,
    protocol features, metaData) stays byte-pinned."""
    out = []
    for line in lines:
        if not line.strip():
            continue
        a = json.loads(line)
        kind = next(iter(a))
        body = dict(a[kind])
        if kind == "sidecar":
            body["path"] = "<SIDECAR>"
            body["sizeInBytes"] = "<SIZE>"
        if kind == "metaData":
            body["id"] = "<TABLE_ID>"
            body["schemaString"] = json.loads(body["schemaString"])
        out.append({kind: body})
    return out


def _normalize_stream(spark, table_path, src=None):
    """Normalized action stream for golden pinning. ``src`` masks a
    shallow clone's absolute source-root references (paths + DV
    ``p`` storage) to ``<SRC>`` so the stream is location-free."""
    import re

    def norm_path(p):
        if src is not None:
            # clones store absolute PERCENT-ENCODED source paths;
            # mask both the encoded and raw forms of the root
            from urllib.parse import quote as _q

            p = p.replace(_q(src, safe="/=:"), "<SRC>")
            p = p.replace(src, "<SRC>")
        p = re.sub(
            r"(data/|_change_data/)v(\d{20})-[0-9a-f]{8}/part-[^\"]+",
            lambda m: f"{m.group(1)}<FILE v{int(m.group(2))}>",
            p,
        )
        # partitioned layout: keep the (deterministic, physical-name)
        # partition dirs, mask the stamped file name
        p = re.sub(
            r"(data/|_change_data/)((?:[^/=]+=[^/]*/)+)"
            r"v(\d{20})-[0-9a-f]{8}-part-[^\"]+",
            lambda m: f"{m.group(1)}{m.group(2)}<FILE v{int(m.group(3))}>",
            p,
        )
        return re.sub(
            r"deletion_vector_[0-9a-f-]{36}\.bin", "<DV_FILE>", p
        )

    def norm_dv(body):
        if "deletionVector" in body:
            dv = dict(body["deletionVector"])
            dv["pathOrInlineDv"] = norm_path(dv["pathOrInlineDv"])
            if dv["storageType"] == "u":
                dv["pathOrInlineDv"] = "<DV_UUID>"
            body["deletionVector"] = dv
        return body

    table_id = DL.table_id(table_path)
    stream = []
    for v, a in DL.delta_log_actions(spark, table_path):
        kind = next(iter(a))
        body = dict(a[kind])
        if kind == "metaData":
            body["id"] = (
                "<TABLE_ID>" if body["id"] == table_id else "<FOREIGN>"
            )
            body["schemaString"] = json.loads(body["schemaString"])
        if kind == "add":
            body["path"] = norm_path(body["path"])
            body["size"] = "<SIZE>" if body["size"] > 0 else 0
            # the sidecar uuid is random; everything else in the
            # descriptor (offset, blob size, cardinality) is
            # deterministic and stays pinned
            body = norm_dv(body)
            if "stats" in body:
                st = json.loads(body["stats"])
                body["stats"] = {
                    "fields": sorted(st),
                    "minmax_cols": sorted(st.get("minValues", {})),
                }
        if kind == "remove":
            body["path"] = norm_path(body["path"])
            body = norm_dv(body)
        if kind == "cdc":
            body["path"] = norm_path(body["path"])
            body["size"] = "<SIZE>" if body["size"] > 0 else 0
        if kind == "commitInfo" and src is not None:
            # clone commitInfo records the absolute source root
            params = dict(body.get("operationParameters") or {})
            if "source" in params:
                params["source"] = params["source"].replace(src, "<SRC>")
                body["operationParameters"] = params
        stream.append({"version": v, kind: body})
    return stream


def test_golden_log_conformance(spark, vt):
    """The in-repo substitute for the env-dead external-reader proof
    (delta-rs / duckdb-delta are uninstallable here): replay the
    pinned history and diff the ENTIRE normalized action stream
    against the checked-in golden (tests/data/golden_delta_log.json)
    — every action kind, field set, ordering, schema evolution,
    tombstone, and txn — then validate each raw action against the
    PROTOCOL.md field sets, and the checkpoint parquet against the
    complete-replay-state struct fields."""
    import os

    golden_path = os.path.join(
        os.path.dirname(__file__), "data", "golden_delta_log.json"
    )
    with open(golden_path, encoding="utf-8") as f:
        golden = json.load(f)

    _golden_script(spark, vt)

    # raw PROTOCOL.md field-set validation BEFORE normalization
    for _, a in DL.delta_log_actions(spark, vt.path):
        kind = next(iter(a))
        assert kind in _SPEC_FIELDS, f"unknown action {kind}"
        keys = set(a[kind])
        required = _SPEC_FIELDS[kind]
        optional = _SPEC_OPTIONAL.get(kind, set())
        assert required <= keys, f"{kind} missing {required - keys}"
        assert keys <= required | optional, (
            f"{kind} has undocumented fields {keys - required - optional}"
        )

    stream = _normalize_stream(spark, vt.path)
    assert stream == golden["json_actions"]

    # checkpoint parquet: complete replay state struct fields
    import pyarrow.parquet as pq

    ck = f"{vt.path}/_delta_log/{9:020d}.checkpoint.parquet"
    local = ck[len("file:"):] if ck.startswith("file:") else ck
    sch = pq.read_schema(local)
    fields = {}
    for i in range(len(sch.names)):
        fld = sch.field(i)
        fields[fld.name] = (
            sorted(sf.name for sf in fld.type)
            if str(fld.type).startswith("struct")
            else str(fld.type)
        )
    assert fields == golden["checkpoint_struct_fields"]
    rows = pq.read_table(local).to_pylist()
    kinds = sorted(
        next(
            k
            for k in ("protocol", "metaData", "add", "remove", "txn")
            if r.get(k) is not None
        )
        for r in rows
    )
    assert kinds == golden["checkpoint_row_kinds"]

    # retention: cleanup leaves exactly the golden survivors (the
    # checkpoint version plus the post-checkpoint tail: OPTIMIZE,
    # the final append, both merge-on-read DML commits, and the
    # round-12 tail — rename, post-rename append, RESTORE, DROP
    # COLUMN, partitioned overwrite), and the spec snapshot still
    # resolves (checkpoint + tail) — protocol upgrades, DV masks,
    # column mapping, and the new partition layout included
    assert DL.cleanup_log(spark, vt.path) == 9
    surviving = sorted({v for v, _ in DL.delta_log_actions(spark, vt.path)})
    assert surviving == golden["surviving_json_versions"] == list(
        range(9, 19)
    )
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["version"] == 18
    assert snap["txns"] == {"app1": 5}
    assert snap["protocol"]["minReaderVersion"] == 3
    assert sorted(snap["protocol"]["readerFeatures"]) == [
        "columnMapping", "deletionVectors",
    ]
    assert snap["partition_columns"] == ["label"]
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())
    vals = {r.id: r.label for r in vt.read().collect()}
    assert vals == {50: "x", 51: "x", 52: "y"}
    # pre-restore state reachable via the custom log's time travel:
    # the DV DELETE (id=20 gone) and UPDATE (30 -> "q") still hold
    hist = {r.id: r.val for r in vt.read(version=14).collect()}
    assert 20 not in hist and hist[30] == "q"


def test_compaction_is_data_change_false(spark, vt, tmp_path):
    """Round-10 OPTIMIZE semantics: compaction reorganizes files
    without changing rows, so (a) the commit records
    dataChange=false in BOTH logs, (b) batch CDF across it yields
    zero rows, (c) a versionedcdf stream does not re-emit the table,
    (d) reads and the spec replay still see identical data, and
    (e) a LATER real append streams normally."""
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    for i in range(4):
        vt.write(
            _df(spark, [(i, f"r{i}")]),
            timestamp=f"2026-09-{i + 1:02d}T00:00:00",
        )
    before = _rows(vt.read())

    out = str(tmp_path / "cdf_out")
    ckpt = str(tmp_path / "cdf_ckpt")

    def drain():
        q = (
            spark.readStream.format("versionedcdf")
            .option("path", vt.path)
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_before = spark.read.json(out).count()
    assert n_before == 4

    v_compact = vt.compact(timestamp="2026-09-05T00:00:00")
    assert _rows(vt.read()) == before  # rows unchanged
    # (a) both logs carry the flag
    commits = vt._commits()
    assert commits[-1].data_change is False
    with open(
        f"{vt.path}/_delta_log/{v_compact - 1:020d}.json", encoding="utf-8"
    ) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    adds = [a["add"] for a in actions if "add" in a]
    removes = [a["remove"] for a in actions if "remove" in a]
    assert adds and removes
    assert all(a["dataChange"] is False for a in adds)
    assert all(r["dataChange"] is False for r in removes)
    # (b) batch CDF across the compaction is empty
    assert vt.read_changes(v_compact - 1, v_compact).count() == 0
    # (d) the spec replay sees the compacted files, same data
    assert _rows(DL.read_delta(spark, vt.path)) == before
    # (c) the stream does not re-emit the table for the compaction
    drain()
    assert spark.read.json(out).count() == n_before
    # (e) a later real append streams normally
    vt.write(_df(spark, [(9, "new")]), timestamp="2026-09-06T00:00:00")
    drain()
    got = spark.read.json(out)
    assert got.count() == n_before + 1
    assert got.filter("id = 9").collect()[0]["_change_version"] == (
        v_compact + 1
    )


def test_read_foreign_multipart_checkpoint(spark, tmp_path):
    """Round-10 interop: real Delta writers may split a checkpoint
    into MULTI-PART files (%020d.checkpoint.%010d.%010d.parquet with
    a "parts" field in _last_checkpoint); the spec reader must
    resolve from all parts plus the JSON tail."""
    import os

    root = str(tmp_path / "mp")
    os.makedirs(f"{root}/_delta_log")
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "val"])
    b = spark.createDataFrame([(3, "z")], ["id", "val"])
    a.coalesce(1).write.parquet(f"{root}/fa")
    b.coalesce(1).write.parquet(f"{root}/fb")

    def one_part(d):
        return next(
            f"{d}/{f}"
            for f in os.listdir(f"{root}/{d}")
            if f.startswith("part-")
        )

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("val", StringType())]
    )
    meta = (
        "m-id",
        ("parquet", {}),
        schema.json(),
        [],
        {},
        0,
    )
    # part 1: protocol + metaData; part 2: the two adds
    rows1 = [((1, 2), None, None), (None, meta, None)]
    rows2 = [
        (None, None, (one_part("fa"), {}, 1, 0, True)),
        (None, None, (one_part("fb"), {}, 1, 0, True)),
    ]
    ck_schema = """
        protocol struct<minReaderVersion:int, minWriterVersion:int>,
        metaData struct<id:string,
            format:struct<provider:string, options:map<string,string>>,
            schemaString:string, partitionColumns:array<string>,
            configuration:map<string,string>, createdTime:bigint>,
        add struct<path:string, partitionValues:map<string,string>,
            size:bigint, modificationTime:bigint, dataChange:boolean>
    """
    for i, rows in ((1, rows1), (2, rows2)):
        df = spark.createDataFrame(rows, schema=ck_schema).coalesce(1)
        tmp = f"{root}/_tmpck{i}"
        df.write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.startswith("part-")
        )
        os.rename(
            f"{tmp}/{part}",
            f"{root}/_delta_log/"
            f"{4:020d}.checkpoint.{i:010d}.{2:010d}.parquet",
        )
    with open(f"{root}/_delta_log/_last_checkpoint", "w") as f:
        json.dump({"version": 4, "size": 4, "parts": 2}, f)
    # a JSON tail commit after the checkpoint
    with open(f"{root}/_delta_log/{5:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "remove": {
                        "path": one_part("fb"),
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
            )
        )
    got = DL.read_delta(spark, root)
    assert _rows(got) == [(1, "x"), (2, "y")]  # fb removed by the tail
    snap = DL.delta_snapshot(spark, root)
    assert snap["version"] == 5


def test_reader_protocol_v2_refused_honestly(spark, tmp_path):
    """Round-10 interop guard, round-11 boundary: protocol 2 (column
    mapping) and unsupported v3 features refuse (covered in
    test_read_delta_still_refuses_column_mapping); a v3 protocol
    demanding NO reader features is degenerate-but-harmless and must
    READ — features are what change the data files' meaning, and
    none are demanded."""
    import os

    root = str(tmp_path / "v3")
    os.makedirs(f"{root}/_delta_log")
    a = spark.createDataFrame([(1, "x")], ["id", "val"])
    a.coalesce(1).write.parquet(f"{root}/f")
    part = next(
        f"f/{f}" for f in os.listdir(f"{root}/f") if f.startswith("part-")
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType()), StructField("val", StringType())]
    )
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
        {
            "metaData": {
                "id": "dv",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": part,
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(x) for x in actions))
    assert _rows(DL.read_delta(spark, root)) == [(1, "x")]


def test_txn_replay_last_writer_wins(spark, tmp_path):
    """Round-11 regression (ADVICE r10): the protocol's txn replay is
    last-writer-wins per appId — a foreign writer may legitimately
    LOWER an appId's version, and version-ordered JSON replay must
    surface the later (lower) value, not max()."""
    import os

    root = str(tmp_path / "txnlww")
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            + "\n"
            + json.dumps({"txn": {"appId": "app1", "version": 7}})
        )
    with open(f"{root}/_delta_log/{1:020d}.json", "w") as f:
        f.write(json.dumps({"txn": {"appId": "app1", "version": 3}}))
    snap = DL.delta_snapshot(spark, root)
    assert snap["txns"] == {"app1": 3}


def test_checkpoint_tombstones_expire(spark, vt):
    """Round-11 regression (ADVICE r10): checkpoint tombstones honor
    Delta's deletedFileRetentionDuration — removes older than the
    retention window relative to the checkpointing commit expire, so
    overwrite-heavy tables don't carry their full delete history in
    every checkpoint. Fresh removes within the window stay."""
    vt.write(_df(spark, [(1, "old")]), timestamp="2026-01-01T00:00:00")
    old_files = DL.delta_snapshot(spark, vt.path)["files"]
    # overwrite in January: its tombstones are months stale by the
    # time the checkpointing commit lands in June
    vt.write(
        _df(spark, [(2, "ow1")]),
        mode="overwrite",
        timestamp="2026-01-02T00:00:00",
    )
    for i in range(6):  # commits 3..8
        vt.write(
            _df(spark, [(10 + i, f"s{i}")]),
            timestamp=f"2026-06-{i + 1:02d}T00:00:00",
        )
    before_ow2 = DL.delta_snapshot(spark, vt.path)["files"]
    # fresh overwrite one day before the checkpointing commit
    vt.write(
        _df(spark, [(3, "ow2")]),
        mode="overwrite",
        timestamp="2026-06-07T00:00:00",
    )
    vt.write(_df(spark, [(4, "tip")]), timestamp="2026-06-08T00:00:00")
    ck = spark.read.parquet(
        f"{vt.path}/_delta_log/{9:020d}.checkpoint.parquet"
    )
    removes = sorted(
        r["remove"]["path"] for r in ck.collect() if r["remove"] is not None
    )
    # January tombstones expired; June-07 tombstones retained
    assert removes == sorted(before_ow2)
    assert not set(removes) & set(old_files)
    # replay correctness is unaffected by expiry
    assert DL.cleanup_log(spark, vt.path) > 0
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())


# ---- deletion vectors (round 11: reader protocol 3) ---------------------
#
# The test side carries its own independent ENCODER for the public
# formats (RoaringFormatSpec 32-bit portable + Delta's 64-bit
# RoaringBitmapArray + the DV sidecar file layout), so the reader is
# checked against spec-constructed bytes, not against itself.


def _ser_r32(values, run_keys=frozenset()):
    groups: dict[int, list[int]] = {}
    for v in sorted(values):
        groups.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(groups)
    size = len(keys)
    runs_here = set(run_keys) & set(keys)
    if runs_here:
        head = ((12347) | ((size - 1) << 16)).to_bytes(4, "little")
        flags = bytearray((size + 7) // 8)
        for i, k in enumerate(keys):
            if k in runs_here:
                flags[i // 8] |= 1 << (i % 8)
        head += bytes(flags)
        has_offsets = size >= 4
    else:
        head = (12346).to_bytes(4, "little") + size.to_bytes(4, "little")
        has_offsets = True
    desc = b"".join(
        k.to_bytes(2, "little") + (len(groups[k]) - 1).to_bytes(2, "little")
        for k in keys
    )
    conts = []
    for k in keys:
        vals = groups[k]
        if k in runs_here:
            runs = []
            s = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                    continue
                runs.append((s, prev - s))
                s = prev = v
            runs.append((s, prev - s))
            c = len(runs).to_bytes(2, "little") + b"".join(
                a.to_bytes(2, "little") + ln.to_bytes(2, "little")
                for a, ln in runs
            )
        elif len(vals) <= 4096:
            c = b"".join(v.to_bytes(2, "little") for v in vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v // 8] |= 1 << (v % 8)
            c = bytes(bits)
        conts.append(c)
    out = head + desc
    if has_offsets:
        base = len(out) + 4 * size
        offs = b""
        for c in conts:
            offs += base.to_bytes(4, "little")
            base += len(c)
        out += offs
    return out + b"".join(conts)


def _dv_blob(positions, run_keys=frozenset()):
    groups: dict[int, list[int]] = {}
    for p in sorted(positions):
        groups.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(groups) + 1) if groups else 0
    out = (1681511377).to_bytes(4, "little") + n.to_bytes(8, "little")
    for hi in range(n):
        out += _ser_r32(groups.get(hi, []), run_keys)
    return bytes(out)


def _dv_sidecar(blob, pad=0):
    """DV file layout: version byte 1, then (after optional padding,
    exercising a non-trivial offset) i32-BE size + blob + i32-BE
    CRC-32."""
    import zlib

    body = b"\x01" + b"\x00" * pad
    offset = len(body)
    body += (
        len(blob).to_bytes(4, "big")
        + blob
        + zlib.crc32(blob).to_bytes(4, "big")
    )
    return body, offset


def test_roaring_decoder_all_container_kinds():
    """Array, bitset, and run containers across multiple 16-bit keys
    AND multiple 32-bit bitmaps (row indexes past 2^32) decode to
    exactly the encoded set."""
    from etl_deltalake_spark.sources.delta_log import (
        roaring_array_positions,
    )

    vals = (
        [5, 9, 40000]                      # array container, key 0
        + list(range(100_000, 105_001))    # card 5001 > 4096 → bitset
        + list(range(200_000, 200_040))    # run container (key 3)
        + [(1 << 32) + 7, (1 << 32) + 8]   # second 64-bit bitmap
    )
    blob = _dv_blob(vals, run_keys={3})
    assert b"\x03\x00\x27\x00" in blob  # run container descriptive pair
    assert roaring_array_positions(blob) == sorted(vals)
    with pytest.raises(ValueError, match="magic"):
        roaring_array_positions(b"\x00" * 16)
    with pytest.raises(ValueError, match="trailing"):
        roaring_array_positions(blob + b"\x00")


def _write_one_parquet(spark, rows, schema, dir_path):
    import os

    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(dir_path)
    (name,) = [f for f in os.listdir(dir_path) if f.startswith("part-")]
    return name


def test_read_delta_deletion_vector_uuid_sidecar(spark, tmp_path):
    """A foreign reader-protocol-3 table with a UUID-sidecar DV on
    one of two files: deleted row indexes are absent, the un-DV'd
    file unaffected. Sidecar name and base85 encoding follow
    PROTOCOL.md (prefix + RFC-1924 base85 uuid, version byte,
    BE size + CRC framing)."""
    import base64
    import os
    import uuid

    root = str(tmp_path / "dvu")
    fa = _write_one_parquet(
        spark, [(i, f"a{i}") for i in range(10)], "id long, val string",
        f"{root}/fa",
    )
    fb = _write_one_parquet(
        spark, [(100 + i, f"b{i}") for i in range(4)], "id long, val string",
        f"{root}/fb",
    )
    blob = _dv_blob([0, 3, 7])
    body, offset = _dv_sidecar(blob, pad=5)
    u = uuid.uuid4()
    os.makedirs(f"{root}/ab", exist_ok=True)
    with open(f"{root}/ab/deletion_vector_{u}.bin", "wb") as f:
        f.write(body)
    enc = "ab" + base64.b85encode(u.bytes).decode()
    schema = spark.createDataFrame([], "id long, val string").schema
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dvu",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"fa/{fa}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "u",
                    "pathOrInlineDv": enc,
                    "offset": offset,
                    "sizeInBytes": len(blob),
                    "cardinality": 3,
                },
            }
        },
        {
            "add": {
                "path": f"fb/{fb}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = _rows(DL.read_delta(spark, root))
    want = [(i, f"a{i}") for i in range(10) if i not in (0, 3, 7)] + [
        (100 + i, f"b{i}") for i in range(4)
    ]
    assert got == sorted(want)


def test_read_delta_deletion_vector_inline_partitioned(spark, tmp_path):
    """Inline ('i') DV storage on a PARTITIONED table: base85 blob in
    the action itself, masking composes with partition-value literal
    injection."""
    import base64
    import os

    root = str(tmp_path / "dvi")
    fa = _write_one_parquet(
        spark, [(i,) for i in range(6)], "id long", f"{root}/p=x/fa"
    )
    fb = _write_one_parquet(
        spark, [(10 + i,) for i in range(3)], "id long", f"{root}/p=y/fb"
    )
    blob = _dv_blob([1, 4])
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("id", LongType()), StructField("p", StringType())]
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dvi",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ["p"],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"p=x/fa/{fa}",
                "partitionValues": {"p": "x"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "i",
                    "pathOrInlineDv": base64.b85encode(blob).decode(),
                    "sizeInBytes": len(blob),
                    "cardinality": 2,
                },
            }
        },
        {
            "add": {
                "path": f"p=y/fb/{fb}",
                "partitionValues": {"p": "y"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = _rows(DL.read_delta(spark, root))
    assert got == [
        (0, "x"), (2, "x"), (3, "x"), (5, "x"),
        (10, "y"), (11, "y"), (12, "y"),
    ]


def test_read_delta_refuses_unknown_reader_features(spark, tmp_path):
    """v3 tables demanding reader features beyond the implemented
    set (deletionVectors, columnMapping, timestampNtz, v2Checkpoint,
    typeWidening, vacuumProtocolCheck, variantType) stay honestly
    refused — an unknown feature changes what the data files mean."""
    import os

    for sub, proto in [
        (
            "r3xx",
            {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "futureFeatureX"],
                "writerFeatures": [],
            },
        ),
    ]:
        root = str(tmp_path / sub)
        os.makedirs(f"{root}/_delta_log")
        schema = spark.createDataFrame([], "id long").schema
        actions = [
            {"protocol": proto},
            {
                "metaData": {
                    "id": sub,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ]
        with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions))
        with pytest.raises(
            ValueError, match="unsupported reader features.*futureFeatureX"
        ):
            DL.read_delta(spark, root)


def test_dv_corruption_detected(spark, tmp_path):
    """CRC mismatch, size mismatch, and cardinality mismatch each
    raise instead of silently resurrecting or over-deleting rows."""
    import base64

    from etl_deltalake_spark.sources.delta_log import dv_positions

    blob = _dv_blob([2, 5])
    good = {
        "storageType": "i",
        "pathOrInlineDv": base64.b85encode(blob).decode(),
        "sizeInBytes": len(blob),
        "cardinality": 2,
    }
    assert dv_positions(spark, str(tmp_path), good) == [2, 5]
    with pytest.raises(ValueError, match="sizeInBytes"):
        dv_positions(spark, str(tmp_path), {**good, "sizeInBytes": 3})
    with pytest.raises(ValueError, match="cardinality"):
        dv_positions(spark, str(tmp_path), {**good, "cardinality": 9})
    body, offset = _dv_sidecar(blob)
    bad = bytearray(body)
    bad[-1] ^= 0xFF  # corrupt the CRC
    p = tmp_path / "dv.bin"
    p.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="checksum"):
        dv_positions(
            spark,
            str(tmp_path),
            {
                "storageType": "p",
                "pathOrInlineDv": str(p),
                "offset": offset,
                "sizeInBytes": len(blob),
                "cardinality": 2,
            },
        )


# ---- column mapping (round 11: reader protocols 2 and 3) ----------------


def _cm_field(name, dtype, cid, phys, nested_fields=None):
    meta = {
        "delta.columnMapping.id": cid,
        "delta.columnMapping.physicalName": phys,
    }
    body = {"name": name, "type": dtype, "nullable": True, "metadata": meta}
    return body


def test_read_delta_column_mapping_name_mode(spark, tmp_path):
    """A protocol-2 name-mode table: parquet stores col-<uuid>
    physical names (including inside a nested struct), the reader
    surfaces logical names; partitionValues are keyed by the
    partition column's PHYSICAL name."""
    import os

    root = str(tmp_path / "cmname")
    # physical layout: col-a (long), col-n struct<col-x string>
    part = _write_one_parquet(
        spark,
        [(i, (f"v{i}",)) for i in range(4)],
        "`col-a` long, `col-n` struct<`col-x`: string>",
        f"{root}/col-p=east/f",
    )
    schema_json = {
        "type": "struct",
        "fields": [
            _cm_field("id", "long", 1, "col-a"),
            {
                "name": "nest",
                "type": {
                    "type": "struct",
                    "fields": [_cm_field("x", "string", 3, "col-x")],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-n",
                },
            },
            _cm_field("region", "string", 4, "col-p"),
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cmname",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema_json),
                "partitionColumns": ["region"],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"col-p=east/f/{part}",
                "partitionValues": {"col-p": "east"},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = DL.read_delta(spark, root)
    assert got.columns == ["id", "nest", "region"]
    assert got.schema["nest"].dataType.fieldNames() == ["x"]
    rows = sorted((r["id"], r["nest"]["x"], r["region"]) for r in got.collect())
    assert rows == [(i, f"v{i}", "east") for i in range(4)]


def test_read_delta_column_mapping_id_mode(spark, tmp_path):
    """An id-mode table whose parquet column NAMES match neither the
    logical nor the recorded physical names — only the parquet field
    ids line up, so a read that resolves by any name fails and only
    true field-id matching returns the data."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmid")
    os.makedirs(f"{root}/data")
    t = pa.table(
        {
            "scrambled_a": pa.array([10, 11, 12], pa.int64()),
            "scrambled_b": pa.array(["p", "q", "r"], pa.string()),
        }
    )
    t = t.cast(
        pa.schema(
            [
                pa.field(
                    "scrambled_a",
                    pa.int64(),
                    metadata={b"PARQUET:field_id": b"7"},
                ),
                pa.field(
                    "scrambled_b",
                    pa.string(),
                    metadata={b"PARQUET:field_id": b"9"},
                ),
            ]
        )
    )
    pq.write_table(t, f"{root}/data/f1.parquet")
    schema_json = {
        "type": "struct",
        "fields": [
            _cm_field("amount", "long", 7, "col-amt"),
            _cm_field("tag", "string", 9, "col-tag"),
        ],
    }
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
                "id": "cmid",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema_json),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "data/f1.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = DL.read_delta(spark, root)
    assert got.columns == ["amount", "tag"]
    assert _rows(got) == [(10, "p"), (11, "q"), (12, "r")]


def test_read_delta_column_mapping_with_deletion_vector(spark, tmp_path):
    """Both round-11 reader features COMPOSED: a name-mode table with
    an inline DV — physical-name scan, row masking, then logical
    rename."""
    import base64
    import os

    root = str(tmp_path / "cmdv")
    part = _write_one_parquet(
        spark,
        [(i, f"t{i}") for i in range(5)],
        "`col-u` long, `col-v` string",
        f"{root}/f",
    )
    blob = _dv_blob([0, 2])
    schema_json = {
        "type": "struct",
        "fields": [
            _cm_field("id", "long", 1, "col-u"),
            _cm_field("val", "string", 2, "col-v"),
        ],
    }
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["columnMapping", "deletionVectors"],
                "writerFeatures": [],
            }
        },
        {
            "metaData": {
                "id": "cmdv",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema_json),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"f/{part}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "i",
                    "pathOrInlineDv": base64.b85encode(blob).decode(),
                    "sizeInBytes": len(blob),
                    "cardinality": 2,
                },
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = DL.read_delta(spark, root)
    assert got.columns == ["id", "val"]
    assert _rows(got) == [(1, "t1"), (3, "t3"), (4, "t4")]


def test_read_delta_unknown_column_mapping_mode_refused(spark, tmp_path):
    import os

    root = str(tmp_path / "cmbad")
    os.makedirs(f"{root}/_delta_log")
    schema = spark.createDataFrame([], "id long").schema
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "cmbad",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "weird"},
                "createdTime": 0,
            }
        },
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(ValueError, match="columnMapping.mode"):
        DL.read_delta(spark, root)


# ---- v2 checkpoints + timestampNtz (round 11, second wave) ---------------


def _pa_struct_col(pylist, pa_type):
    import pyarrow as pa

    return pa.array(pylist, type=pa_type)


def _write_v2_fixture(spark, tmp_path, manifest_kind):
    """A foreign table whose ONLY checkpoint is a V2 named manifest
    (parquet or json) with file actions in a _sidecars parquet, plus
    one JSON commit past the checkpoint to prove tail replay still
    composes."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / f"v2{manifest_kind}")
    log = f"{root}/_delta_log"
    os.makedirs(f"{log}/_sidecars")
    fa = _write_one_parquet(
        spark, [(i, f"a{i}") for i in range(3)], "id long, val string",
        f"{root}/fa",
    )
    fb = _write_one_parquet(
        spark, [(10 + i, f"b{i}") for i in range(2)], "id long, val string",
        f"{root}/fb",
    )
    schema = spark.createDataFrame([], "id long, val string").schema

    def add_action(path):
        return {
            "path": path,
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }

    # sidecar parquet holding the checkpoint's add actions
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    def to_pa_add(a):
        b = dict(a)
        b["partitionValues"] = list(b["partitionValues"].items())
        return b

    side_name = f"{uuid.uuid4()}.parquet"
    pq.write_table(
        pa.table({"add": _pa_struct_col(
            [to_pa_add(add_action(f"fa/{fa}"))], add_t
        )}),
        f"{log}/_sidecars/{side_name}",
    )

    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = {
        "id": "v2fix",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema.json(),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    manifest_name = f"{0:020d}.checkpoint.{uuid.uuid4()}.{manifest_kind}"
    if manifest_kind == "json":
        actions = [
            {"checkpointMetadata": {"version": 0}},
            {"protocol": proto},
            {"metaData": meta},
            {
                "sidecar": {
                    "path": side_name,
                    "sizeInBytes": 1,
                    "modificationTime": 0,
                }
            },
        ]
        with open(f"{log}/{manifest_name}", "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions))
    else:
        ckm_t = pa.struct([("version", pa.int64())])
        proto_t = pa.struct(
            [
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ]
        )
        meta_t = pa.struct(
            [
                ("id", pa.string()),
                ("format", pa.struct(
                    [("provider", pa.string()),
                     ("options", pa.map_(pa.string(), pa.string()))]
                )),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("createdTime", pa.int64()),
            ]
        )
        side_t = pa.struct(
            [
                ("path", pa.string()),
                ("sizeInBytes", pa.int64()),
                ("modificationTime", pa.int64()),
            ]
        )
        meta_pa = dict(meta)
        meta_pa["format"] = {
            "provider": "parquet",
            "options": [],
        }
        meta_pa["configuration"] = []
        rows = 4
        tbl = pa.table(
            {
                "checkpointMetadata": _pa_struct_col(
                    [{"version": 0}, None, None, None], ckm_t
                ),
                "protocol": _pa_struct_col(
                    [None, proto, None, None], proto_t
                ),
                "metaData": _pa_struct_col(
                    [None, None, meta_pa, None], meta_t
                ),
                "sidecar": _pa_struct_col(
                    [
                        None,
                        None,
                        None,
                        {
                            "path": side_name,
                            "sizeInBytes": 1,
                            "modificationTime": 0,
                        },
                    ],
                    side_t,
                ),
            }
        )
        pq.write_table(tbl, f"{log}/{manifest_name}")
    with open(f"{log}/_last_checkpoint", "w") as f:
        f.write(json.dumps({"version": 0, "size": 4}))
    # JSON tail past the checkpoint: one more add
    with open(f"{log}/{1:020d}.json", "w") as f:
        f.write(json.dumps({"add": add_action(f"fb/{fb}")}))
    return root


@pytest.mark.parametrize("kind", ["parquet", "json"])
def test_read_delta_v2_named_checkpoint(spark, tmp_path, kind):
    """A V2 named checkpoint (manifest + _sidecars file actions, the
    reader feature modern writers gate checkpoints behind) resolves:
    protocol/metaData from the manifest, adds from the sidecar, and
    the JSON tail past the checkpoint still replays on top."""
    root = _write_v2_fixture(spark, tmp_path, kind)
    snap = DL.delta_snapshot(spark, root)
    assert snap["version"] == 1
    assert len(snap["adds"]) == 2
    got = _rows(DL.read_delta(spark, root))
    assert got == [
        (0, "a0"), (1, "a1"), (2, "a2"), (10, "b0"), (11, "b1"),
    ]


def test_v2_checkpoint_version_mismatch_refused(spark, tmp_path):
    import os
    import uuid

    root = str(tmp_path / "v2bad")
    log = f"{root}/_delta_log"
    os.makedirs(log)
    name = f"{0:020d}.checkpoint.{uuid.uuid4()}.json"
    with open(f"{log}/{name}", "w") as f:
        f.write(json.dumps({"checkpointMetadata": {"version": 5}}))
    with open(f"{log}/_last_checkpoint", "w") as f:
        f.write(json.dumps({"version": 0}))
    with pytest.raises(ValueError, match="manifest is for version 5"):
        DL.delta_snapshot(spark, root)


def test_read_delta_timestamp_ntz_feature(spark, tmp_path):
    """timestampNtz: a v3 table whose schema carries timestamp_ntz
    reads through Spark's native TIMESTAMP_NTZ parquet support —
    values match what was written, no UTC adjustment."""
    import datetime
    import os

    root = str(tmp_path / "ntz")
    df = spark.createDataFrame(
        [(1, datetime.datetime(2026, 3, 1, 12, 30, 0))],
        "id long, ts timestamp_ntz",
    )
    part = _write_one_parquet(
        spark,
        [(1, datetime.datetime(2026, 3, 1, 12, 30, 0))],
        "id long, ts timestamp_ntz",
        f"{root}/f",
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        },
        {
            "metaData": {
                "id": "ntz",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"f/{part}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = DL.read_delta(spark, root)
    assert got.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert _rows(got) == [
        (1, datetime.datetime(2026, 3, 1, 12, 30, 0)),
    ]


def test_read_delta_variant_type_feature(spark, tmp_path):
    """variantType: a v3 table whose schema carries a VARIANT column
    reads through Spark 4's native variant parquet support; values
    survive semantically (compared via cast to string)."""
    import os

    from pyspark.sql import functions as F

    root = str(tmp_path / "vart")
    df = spark.range(3).select(
        "id",
        F.parse_json(
            F.format_string('{"a": %d, "b": "x%d"}', F.col("id"), F.col("id"))
        ).alias("v"),
    )
    df.coalesce(1).write.parquet(f"{root}/f")
    (part,) = [
        f for f in os.listdir(f"{root}/f") if f.startswith("part-")
    ]
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["variantType"],
                "writerFeatures": ["variantType"],
            }
        },
        {
            "metaData": {
                "id": "vart",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"f/{part}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    got = DL.read_delta(spark, root)
    assert got.schema["v"].dataType.typeName() == "variant"
    rows = sorted(
        map(tuple, got.select("id", F.col("v").cast("string")).collect())
    )
    assert rows == [
        (0, '{"a":0,"b":"x0"}'),
        (1, '{"a":1,"b":"x1"}'),
        (2, '{"a":2,"b":"x2"}'),
    ]


def test_read_delta_version_as_of(spark, vt):
    """Spec-reader time travel (delta-spark's versionAsOf through the
    public log): every historical version reconstructs; versions
    below the checkpoint fall back to pure JSON replay; once log
    retention deletes those files the reader refuses honestly."""
    states = []
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-02-01T00:00:00")
    states.append(_rows(vt.read()))
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-02-02T00:00:00")
    states.append(_rows(vt.read()))
    vt.write(
        _df(spark, [(9, "ow")]),
        mode="overwrite",
        timestamp="2026-02-03T00:00:00",
    )
    states.append(_rows(vt.read()))
    for dv, want in enumerate(states):
        assert _rows(DL.read_delta(spark, vt.path, version=dv)) == want
    # snapshot version is pinned, not just rows
    assert DL.delta_snapshot(spark, vt.path, version=1)["version"] == 1
    # roll past the checkpoint (10th commit checkpoints at delta 9),
    # clean the log, and confirm pre-checkpoint versions now refuse
    for i in range(7):
        vt.write(
            _df(spark, [(20 + i, f"s{i}")]),
            timestamp=f"2026-02-{4 + i:02d}T00:00:00",
        )
    # pre-cleanup: JSON replay from 0 still works below the checkpoint
    assert _rows(DL.read_delta(spark, vt.path, version=1)) == states[1]
    assert DL.cleanup_log(spark, vt.path) == 9
    with pytest.raises(ValueError, match="log retention"):
        DL.read_delta(spark, vt.path, version=1)
    # at-and-after the checkpoint still resolves
    assert DL.delta_snapshot(spark, vt.path, version=9)["version"] == 9
    latest = _rows(vt.read())
    assert _rows(DL.read_delta(spark, vt.path)) == latest


# ---- deletion-vector WRITE (round 11: merge-on-read DML) ----------------
#
# The write-side twin of the reader section above: delete_where /
# update_where with use_dv=True mask rows with RoaringBitmapArray
# deletion vectors instead of rewriting files. The production encoder
# (delta_log.roaring_array_serialize) is validated three ways: against
# the production decoder, against the INDEPENDENT spec encoder at the
# top of the reader section (_dv_blob), and end-to-end through the
# mirrored Delta log read back by the spec reader.


def test_roaring_encoder_round_trip_and_cross_check():
    from etl_deltalake_spark.sources.delta_log import (
        roaring_array_positions,
        roaring_array_serialize,
    )

    cases = [
        [],
        [0],
        [5, 9, 40000],
        list(range(4096)),                 # array-container boundary
        list(range(4097)),                 # first bitset container
        list(range(100_000, 105_001)),     # bitset mid-key
        [65535, 65536, 131072],            # 16-bit key edges
        [(1 << 32) + 7, (3 << 32) + 1],    # >2^32 rows, gap bitmaps
    ]
    for vals in cases:
        blob = roaring_array_serialize(vals)
        assert roaring_array_positions(blob) == sorted(vals)
    # cross-check vs the independent spec encoder: identical sets must
    # decode identically from BOTH encoders' bytes
    vals = [1, 70_000, *range(200_000, 204_200), (1 << 32) + 5]
    assert roaring_array_positions(
        roaring_array_serialize(vals)
    ) == roaring_array_positions(_dv_blob(vals)) == sorted(vals)


def test_dv_delete_masks_without_rewriting_files(spark, vt):
    import os

    vals = [(i, f"v{i}") for i in range(50)]
    vt.write(_df(spark, vals), timestamp="2026-01-01T00:00:00")
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    data_before = sorted(
        f for d in os.listdir(f"{root}/data")
        for f in os.listdir(f"{root}/data/{d}")
    )
    n = vt.delete_where(
        F.col("id") % 5 == 0, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    assert n == 10
    data_after = sorted(
        f for d in os.listdir(f"{root}/data")
        for f in os.listdir(f"{root}/data/{d}")
    )
    assert data_before == data_after  # merge-on-read: no file rewrite
    assert any(
        f.startswith("deletion_vector_") for f in os.listdir(root)
    )
    assert _rows(vt.read()) == sorted(
        (i, f"v{i}") for i in range(50) if i % 5
    )
    # pre-delete snapshot still time-travels
    assert len(_rows(vt.read(version=1))) == 50
    # a second delete on the same file UNIONS the masks
    n2 = vt.delete_where(
        F.col("id") % 7 == 0, timestamp="2026-01-03T00:00:00", use_dv=True
    )
    assert n2 == 6  # 7,14,21,28,42,49 (0 and 35 already masked)
    assert _rows(vt.read()) == sorted(
        (i, f"v{i}") for i in range(50) if i % 5 and i % 7
    )


def test_dv_delete_null_condition_keeps_rows(spark, vt):
    vt.write(
        _df(spark, [(1, "a"), (2, None), (3, "c")]),
        timestamp="2026-01-01T00:00:00",
    )
    # NULL condition must not delete (SQL DELETE semantics)
    n = vt.delete_where(
        F.col("val") == "a", timestamp="2026-01-02T00:00:00", use_dv=True
    )
    assert n == 1
    assert _rows(vt.read()) == [(2, None), (3, "c")]


def test_dv_mirror_upgrades_protocol_and_spec_reads(spark, vt):
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(20)]).coalesce(1),
        timestamp="2026-01-01T00:00:00",
    )
    vt.delete_where(
        F.col("id") >= 15, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    # the DV commit carries the protocol upgrade action
    actions = [a for v, a in DL.delta_log_actions(spark, vt.path) if v == 1]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert protos == [
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    ]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == 1 and adds[0]["deletionVector"]["cardinality"] == 5
    removes = [a["remove"] for a in actions if "remove" in a]
    assert [r["path"] for r in removes] == [adds[0]["path"]]
    # spec reader: masked rows absent, pre-delete version intact
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())
    assert len(_rows(DL.read_delta(spark, vt.path, version=0))) == 20
    # a SECOND dv commit must not re-emit the upgrade
    vt.delete_where(
        F.col("id") == 0, timestamp="2026-01-03T00:00:00", use_dv=True
    )
    actions2 = [a for v, a in DL.delta_log_actions(spark, vt.path) if v == 2]
    assert not any("protocol" in a for a in actions2)


def test_dv_update_is_one_commit(spark, vt):
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1),
        timestamp="2026-01-01T00:00:00",
    )
    n = vt.update_where(
        F.col("id") < 3,
        {"val": F.concat(F.lit("u"), F.col("id").cast("string"))},
        timestamp="2026-01-02T00:00:00",
        use_dv=True,
    )
    assert n == 3
    # exactly ONE new version: masks + rewritten rows committed together
    assert vt.latest_version() == 2
    want = sorted(
        [(i, f"u{i}") for i in range(3)] + [(i, f"v{i}") for i in range(3, 10)]
    )
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # the commit's add actions: exactly one masked re-add, plus new
    # file(s) holding the rewritten rows — and no empty adds (a
    # filtered narrow scan leaves most write tasks empty; those
    # files must never reach the log)
    actions = [a for v, a in DL.delta_log_actions(spark, vt.path) if v == 1]
    adds = [a["add"] for a in actions if "add" in a]
    masked = [a for a in adds if a.get("deletionVector")]
    fresh = [a for a in adds if not a.get("deletionVector")]
    assert len(masked) == 1 and masked[0]["deletionVector"]["cardinality"] == 3
    assert fresh and all(
        json.loads(a["stats"])["numRecords"] > 0 for a in fresh
    )
    # batch CDF post-image of the update commit: rewritten rows plus
    # the masked file's surviving rows, never the pre-update images
    got = sorted(
        (r.id, r.val) for r in vt.read_changes(1, 2).collect()
    )
    assert got == want


def test_dv_checkpoints_carry_masks(spark, vt):
    for i in range(8):
        vt.write(
            _df(spark, [(i, f"v{i}")]),
            timestamp=f"2026-01-{1 + i:02d}T00:00:00",
        )
    vt.delete_where(
        F.col("id") == 3, timestamp="2026-01-09T00:00:00", use_dv=True
    )
    # 10th commit triggers BOTH checkpoints with a live mask in play
    vt.write(_df(spark, [(100, "x")]), timestamp="2026-01-10T00:00:00")
    ck = vt._latest_checkpoint()
    assert ck["version"] == 10 and ck.get("dv")
    # custom fast path resolves from the checkpoint
    assert (3, "v3") not in _rows(vt.read())
    # mirror checkpoint rows carry the descriptor and the protocol
    rows = DL.checkpoint_actions(
        spark, vt.path, DL._last_checkpoint(spark, vt.path)
    )
    dv_adds = [
        r["add"] for r in rows
        if r.get("add") and r["add"].get("deletionVector")
    ]
    assert len(dv_adds) == 1
    assert dv_adds[0]["deletionVector"]["cardinality"] == 1
    proto = next(r["protocol"] for r in rows if r.get("protocol"))
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["deletionVectors"]
    # spec snapshot FROM the checkpoint (cleanup deletes the tail
    # below it) still masks
    DL.cleanup_log(spark, vt.path)
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())


def test_dv_compact_materializes_and_vacuum_collects(spark, vt):
    import os

    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(30)]),
        timestamp="2026-01-01T00:00:00",
    )
    vt.delete_where(
        F.col("id") < 10, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    want = sorted((i, f"v{i}") for i in range(10, 30))
    vt.compact(timestamp="2026-01-03T00:00:00")
    assert _rows(vt.read()) == want
    # compaction rewrote the masked file: no DV in the live snapshot
    _files, dvs, _latest = vt._snapshot_state()
    assert dvs == {}
    assert not any(
        a.get("deletionVector")
        for a in DL.delta_snapshot(spark, vt.path)["adds"]
    )
    # vacuum to 1 version: the orphaned sidecar is collected
    vt.vacuum(retain_versions=1)
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    assert not any(
        f.startswith("deletion_vector_") for f in os.listdir(root)
    )
    assert _rows(vt.read()) == want


def test_dv_streaming_cdf_masks_deleted_rows(spark, vt, tmp_path):
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    # single data file so the DV commit's post-image is the whole
    # surviving id range (only TOUCHED files re-emit)
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1),
        timestamp="2026-01-01T00:00:00",
    )
    vt.delete_where(
        F.col("id") < 4, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    out = str(tmp_path / "out")
    ckp = str(tmp_path / "ckp")
    q = (
        spark.readStream.format("versionedcdf")
        .option("path", vt.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.id, r._change_version)
        for r in spark.read.parquet(out).collect()
    )
    # v1 emits all 10; the DV commit (v2) re-emits only the 6
    # SURVIVORS — deleted rows never reappear downstream
    assert got == sorted(
        [(i, 1) for i in range(10)] + [(i, 2) for i in range(4, 10)]
    )


# ---- typeWidening + timestamp time travel (round 11, continued) ---------


def test_read_foreign_type_widened_table(spark, tmp_path):
    """Reader feature ``typeWidening``: a file written BEFORE the
    widen carries int32/float32 parquet types while the log's
    metaData schema says bigint/double — reads must surface the
    widened types (Spark 4 parquet widening promotions under the
    projected log schema). ``vacuumProtocolCheck`` rides along to pin
    its allowlisting (the spec sets no reader requirement for it)."""
    import os

    root = str(tmp_path / "tw")
    fa = _write_one_parquet(
        spark, [(1, 1.5), (2, 2.5)], "a int, b float", f"{root}/fa"
    )
    wide = spark.createDataFrame([], "a bigint, b double").schema
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["typeWidening", "vacuumProtocolCheck"],
                "writerFeatures": ["typeWidening", "vacuumProtocolCheck"],
            }
        },
        {
            "metaData": {
                "id": "tw",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": wide.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": f"fa/{fa}",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    os.makedirs(f"{root}/_delta_log")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    df = DL.read_delta(spark, root)
    assert dict(df.dtypes) == {"a": "bigint", "b": "double"}
    assert _rows(df) == [(1, 1.5), (2, 2.5)]
    # a genuinely unknown feature still refuses
    actions[0]["protocol"]["readerFeatures"].append("futureFeature")
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(ValueError, match="futureFeature"):
        DL.read_delta(spark, root)


def test_timestamp_time_travel_by_file_mtime(spark, vt):
    """Spec timestampAsOf, default clock: commit-file modification
    times, monotonically adjusted. mtimes are pinned with os.utime so
    the resolution is deterministic."""
    import os

    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-01-02T00:00:00")
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-01-03T00:00:00")
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    t0 = 1_700_000_000  # seconds
    for v, sec in ((0, t0), (1, t0 + 100), (2, t0 + 200)):
        os.utime(f"{root}/_delta_log/{v:020d}.json", (sec, sec))
    ms = t0 * 1000
    assert _rows(DL.read_delta(spark, vt.path, timestamp=ms)) == [(1, "a")]
    assert _rows(
        DL.read_delta(spark, vt.path, timestamp=ms + 150_000)
    ) == [(1, "a"), (2, "b")]
    assert _rows(
        DL.read_delta(spark, vt.path, timestamp=ms + 200_000)
    ) == [(1, "a"), (2, "b"), (3, "c")]
    with pytest.raises(ValueError, match="predates"):
        DL.read_delta(spark, vt.path, timestamp=ms - 1)
    with pytest.raises(ValueError, match="after the latest"):
        DL.read_delta(spark, vt.path, timestamp=ms + 300_000)
    with pytest.raises(ValueError, match="not both"):
        DL.read_delta(spark, vt.path, version=1, timestamp=ms)


def test_timestamp_time_travel_in_commit_timestamps(spark, tmp_path):
    """Writer feature ``inCommitTimestamp``: when
    delta.enableInCommitTimestamps is set, timestamp resolution must
    use commitInfo.inCommitTimestamp — the table's own recorded clock
    — NOT file mtimes. The fixture's mtimes are deliberately set in
    REVERSE order to prove which clock wins."""
    import os

    root = str(tmp_path / "ict")
    fa = _write_one_parquet(spark, [(1,)], "id long", f"{root}/fa")
    fb = _write_one_parquet(spark, [(2,)], "id long", f"{root}/fb")
    schema = spark.createDataFrame([], "id long").schema
    meta = {
        "metaData": {
            "id": "ict",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": [],
            "configuration": {"delta.enableInCommitTimestamps": "true"},
            "createdTime": 0,
        }
    }
    v0 = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["inCommitTimestamp"],
            }
        },
        meta,
        {"commitInfo": {"timestamp": 50_000, "operation": "WRITE",
                        "inCommitTimestamp": 50_000}},
        {"add": {"path": f"fa/{fa}", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    v1 = [
        {"commitInfo": {"timestamp": 90_000, "operation": "WRITE",
                        "inCommitTimestamp": 90_000}},
        {"add": {"path": f"fb/{fb}", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    os.makedirs(f"{root}/_delta_log")
    for v, acts in ((0, v0), (1, v1)):
        with open(f"{root}/_delta_log/{v:020d}.json", "w") as f:
            f.write("\n".join(json.dumps(a) for a in acts))
    # adversarial mtimes: v0 file NEWER than v1
    os.utime(f"{root}/_delta_log/{0:020d}.json", (2_000_000, 2_000_000))
    os.utime(f"{root}/_delta_log/{1:020d}.json", (1_000_000, 1_000_000))
    assert _rows(DL.read_delta(spark, root, timestamp=50_000)) == [(1,)]
    assert _rows(DL.read_delta(spark, root, timestamp=89_999)) == [(1,)]
    assert _rows(DL.read_delta(spark, root, timestamp=90_000)) == [
        (1,), (2,),
    ]
    with pytest.raises(ValueError, match="predates"):
        DL.read_delta(spark, root, timestamp=49_999)


def test_ict_mirror_timestamp_travel_matches_custom_log(spark, tmp_path):
    """Opt-in in-commit timestamps (writer feature
    ``inCommitTimestamp``): the mirror stamps every commit with the
    caller's logical timestamp, so SPEC timestamp travel resolves by
    the same clock as the custom log's ``read(timestamp=...)`` — file
    mtimes (set adversarially here) become irrelevant."""
    import os

    vt = versioned_table(
        spark, str(tmp_path / "ict_tbl"), use_delta=False, ict=True
    )
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-02-01T00:00:00")
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-03-01T00:00:00")
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    # adversarial mtimes: reverse order — ICT must win
    for v, sec in ((0, 3_000_000), (1, 2_000_000), (2, 1_000_000)):
        os.utime(f"{root}/_delta_log/{v:020d}.json", (sec, sec))
    # protocol + config declare the feature
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["protocol"]["minWriterVersion"] == 7
    assert "inCommitTimestamp" in snap["protocol"]["writerFeatures"]
    assert (
        snap["configuration"]["delta.enableInCommitTimestamps"] == "true"
    )
    # commitInfo is FIRST in each commit file and carries the clock
    first = DL.delta_log_actions(spark, vt.path, 0)[0][1]
    assert "commitInfo" in first
    assert first["commitInfo"]["inCommitTimestamp"] == DL._iso_to_millis(
        "2026-01-01T00:00:00"
    )
    # spec timestamp travel == custom-log timestamp travel
    for ts in ("2026-01-15T00:00:00", "2026-02-01T00:00:00",
               "2026-03-01T00:00:00"):
        assert _rows(DL.read_delta(spark, vt.path, timestamp=ts)) == _rows(
            vt.read(timestamp=ts)
        )
    with pytest.raises(ValueError, match="predates"):
        DL.read_delta(spark, vt.path, timestamp="2025-12-31T00:00:00")
    # a DV commit on an ICT table MERGES the feature lists
    vt.delete_where(
        F.col("id") == 1, timestamp="2026-04-01T00:00:00", use_dv=True
    )
    snap2 = DL.delta_snapshot(spark, vt.path)
    assert snap2["protocol"]["minReaderVersion"] == 3
    assert sorted(snap2["protocol"]["writerFeatures"]) == [
        "deletionVectors", "inCommitTimestamp",
    ]
    assert _rows(DL.read_delta(spark, vt.path)) == [(2, "b"), (3, "c")]


# ---- column-mapping WRITE (round 11: rename/drop without rewrite) -------


def test_rename_column_is_metadata_only(spark, vt):
    import os

    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]),
        timestamp="2026-01-01T00:00:00",
    )
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    data_before = sorted(
        f for sub in os.listdir(f"{root}/data")
        for f in os.listdir(f"{root}/data/{sub}")
    )
    vt.rename_column("val", "label", timestamp="2026-01-02T00:00:00")
    data_after = sorted(
        f for sub in os.listdir(f"{root}/data")
        for f in os.listdir(f"{root}/data/{sub}")
    )
    assert data_before == data_after  # not a byte of data rewritten
    got = vt.read()
    assert got.columns == ["id", "label"]
    assert _rows(got) == [(i, f"v{i}") for i in range(10)]
    # time travel shows the OLD logical names
    assert vt.read(version=1).columns == ["id", "val"]
    # the spec mirror: columnMapping protocol + config + our own
    # spec reader consumes it
    snap = DL.delta_snapshot(spark, vt.path)
    assert "columnMapping" in snap["protocol"]["readerFeatures"]
    assert snap["configuration"]["delta.columnMapping.mode"] == "name"
    sp = DL.read_delta(spark, vt.path)
    assert sp.columns == ["id", "label"]
    assert _rows(sp) == _rows(got)


def test_mapped_table_appends_dml_and_compaction(spark, vt):
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]),
        timestamp="2026-01-01T00:00:00",
    )
    vt.rename_column("val", "label", timestamp="2026-01-02T00:00:00")
    # appends after the rename write files under the PHYSICAL name;
    # both readers surface the logical one
    vt.write(
        spark.createDataFrame(
            [(100, "x")], "id long, label string"
        ).coalesce(1),
        timestamp="2026-01-03T00:00:00",
    )
    want = sorted([(i, f"v{i}") for i in range(10)] + [(100, "x")])
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # merge-on-read DELETE keyed on the renamed column
    n = vt.delete_where(
        F.col("label") == "v3", timestamp="2026-01-04T00:00:00",
        use_dv=True,
    )
    assert n == 1
    want = [r for r in want if r[1] != "v3"]
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # merge-on-read UPDATE: rewritten rows land under physical names
    n = vt.update_where(
        F.col("id") == 100,
        {"label": F.lit("y")},
        timestamp="2026-01-05T00:00:00",
        use_dv=True,
    )
    assert n == 1
    want = sorted([(i, f"v{i}") for i in range(10) if i != 3] + [(100, "y")])
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # change-typed CDF over the mapped table uses logical names
    ch = vt.table_changes(3, 5)
    kinds = sorted(
        (r._change_type, r.id, r.label) for r in ch.collect()
    )
    assert kinds == [
        ("delete", 3, "v3"),
        ("update_postimage", 100, "y"),
        ("update_preimage", 100, "x"),
    ]
    # compaction materializes and keeps the mapping working
    vt.compact(timestamp="2026-01-06T00:00:00")
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want


def test_drop_column_and_name_reuse_refusal(spark, vt):
    vt.write(
        _df(spark, [(1, "a"), (2, "b")]),
        timestamp="2026-01-01T00:00:00",
    )
    vt.drop_column("val", timestamp="2026-01-02T00:00:00")
    assert vt.read().columns == ["id"]
    assert DL.read_delta(spark, vt.path).columns == ["id"]
    # the dropped column's physical name is tombstoned: live files
    # still store values under it, so re-adding 'val' must refuse
    # (real Delta avoids this with uuid physical names; this store
    # refuses honestly)
    with pytest.raises(ValueError, match="renamed or dropped"):
        vt.write(
            spark.createDataFrame([(3, "z")], "id long, val string"),
            mode="append",
            timestamp="2026-01-03T00:00:00",
            merge_schema=True,
        )
    # a fresh name is fine and null-fills history
    vt.write(
        spark.createDataFrame([(3, 1.5)], "id long, score double")
        .coalesce(1),
        mode="append",
        timestamp="2026-01-04T00:00:00",
        merge_schema=True,
    )
    got = {(r.id, r.score) for r in vt.read().collect()}
    assert got == {(1, None), (2, None), (3, 1.5)}
    assert got == {
        (r.id, r.score) for r in DL.read_delta(spark, vt.path).collect()
    }
    # rename onto a tombstoned name refuses too
    with pytest.raises(ValueError, match="renamed or dropped"):
        vt.rename_column("score", "val", timestamp="2026-01-05T00:00:00")
    # dropping the only column refuses
    vt.drop_column("score", timestamp="2026-01-06T00:00:00")
    with pytest.raises(ValueError, match="only column"):
        vt.drop_column("id")


def test_mapped_checkpoint_fast_path(spark, vt):
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(4)]),
        timestamp="2026-01-01T00:00:00",
    )
    vt.rename_column("val", "label", timestamp="2026-01-02T00:00:00")
    for i in range(8):
        vt.write(
            spark.createDataFrame(
                [(10 + i, f"s{i}")], "id long, label string"
            ).coalesce(1),
            timestamp=f"2026-01-{3 + i:02d}T00:00:00",
        )
    # custom checkpoint at v10 carries the mapping; the fast path
    # (snapshot from checkpoint + tail) must keep scanning by
    # physical name
    ck = vt._latest_checkpoint()
    assert ck["version"] == 10 and ck.get("mapping")
    got = vt.read()
    assert got.columns == ["id", "label"]
    assert len(_rows(got)) == 12
    # the mirror checkpoint round-trips through the spec reader after
    # log cleanup
    DL.cleanup_log(spark, vt.path)
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(got)


def test_versionedcdf_refuses_mapped_tables(spark, vt, tmp_path):
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.rename_column("val", "label", timestamp="2026-01-02T00:00:00")
    vt.write(
        spark.createDataFrame([(2, "b")], "id long, label string"),
        timestamp="2026-01-03T00:00:00",
    )
    q = (
        spark.readStream.format("versionedcdf")
        .option("path", vt.path)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="column mapping"):
        q.awaitTermination(300)


def test_check_constraints_surface_in_mirror_config(spark, vt):
    """CHECK constraints live in metaData.configuration as
    ``delta.constraints.<name>`` (the spec form real writers
    enforce); adding or dropping one re-emits metaData on the next
    commit even though the schema is unchanged."""
    vt.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    vt.add_constraint("pos", "id >= 0")
    vt.write(_df(spark, [(2, "b")]), timestamp="2026-01-02T00:00:00")
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["configuration"]["delta.constraints.pos"] == "id >= 0"
    vt.drop_constraint("pos")
    vt.write(_df(spark, [(3, "c")]), timestamp="2026-01-03T00:00:00")
    snap2 = DL.delta_snapshot(spark, vt.path)
    assert "delta.constraints.pos" not in snap2["configuration"]


# ---- partitioned versioned tables (round 11: hive layout, pruning) ------


def test_partitioned_write_layout_read_and_pruning(spark, vt):
    import os

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10) for i in range(30)],
        "id long, g string, v long",
    )
    vt.write(
        df, mode="overwrite", timestamp="2026-01-01T00:00:00",
        partition_by=["g"],
    )
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    # REAL Delta layout: hive dirs shared by all commits, partition
    # column NOT in the parquet files
    assert sorted(os.listdir(f"{root}/data")) == ["g=g0", "g=g1", "g=g2"]
    got = vt.read()
    assert sorted((r.id, r.g, r.v) for r in got.collect()) == [
        (i, f"g{i % 3}", i * 10) for i in range(30)
    ]
    # TRUE partition pruning: the filter lands in PartitionFilters,
    # and the scan schema excludes the partition column
    plan = (
        got.filter(F.col("g") == "g1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "g1" in plan.split("PartitionFilters", 1)[1][:160]
    # appends inherit the layout; changing it is an overwrite's job
    vt.write(
        spark.createDataFrame([(100, "g0", 1)], "id long, g string, v long"),
        timestamp="2026-01-02T00:00:00",
    )
    assert vt.read().count() == 31
    with pytest.raises(ValueError, match="overwrite"):
        vt.write(df, timestamp="2026-01-03T00:00:00", partition_by=[])
    # the mirror: metaData.partitionColumns + per-add partitionValues,
    # consumed by the spec reader (which injects from the log)
    snap = DL.delta_snapshot(spark, vt.path)
    assert snap["partition_columns"] == ["g"]
    assert {a["partitionValues"]["g"] for a in snap["adds"]} == {
        "g0", "g1", "g2",
    }
    assert sorted(
        (r.id, r.g, r.v) for r in DL.read_delta(spark, vt.path).collect()
    ) == sorted((r.id, r.g, r.v) for r in vt.read().collect())


def test_partitioned_dml_compaction_and_streams(spark, vt, tmp_path):
    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )
    from etl_deltalake_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    spark.dataSource.register(VersionedCdfDataSource)
    spark.dataSource.register(DeltaStreamDataSource)
    vt.write(
        spark.createDataFrame(
            [(i, f"g{i % 2}", i * 10) for i in range(10)],
            "id long, g string, v long",
        ),
        mode="overwrite",
        timestamp="2026-01-01T00:00:00",
        partition_by=["g"],
    )
    # merge-on-read DELETE keyed on the partition column
    n = vt.delete_where(
        F.col("g") == "g1", timestamp="2026-01-02T00:00:00", use_dv=True
    )
    assert n == 5
    want = {(i, "g0", i * 10) for i in range(0, 10, 2)}
    assert {(r.id, r.g, r.v) for r in vt.read().collect()} == want
    assert {
        (r.id, r.g, r.v) for r in DL.read_delta(spark, vt.path).collect()
    } == want
    # merge-on-read UPDATE: rewritten rows land partitioned
    n = vt.update_where(
        F.col("id") == 2, {"v": F.lit(999).cast("long")},
        timestamp="2026-01-03T00:00:00", use_dv=True,
    )
    assert n == 1
    want = {(i, "g0", i * 10) for i in (0, 4, 6, 8)} | {(2, "g0", 999)}
    assert {(r.id, r.g, r.v) for r in vt.read().collect()} == want
    # compaction preserves the partition layout
    vt.compact(timestamp="2026-01-04T00:00:00")
    _files, dvs, latest = vt._snapshot_state()
    assert tuple(latest.partition_by) == ("g",) and dvs == {}
    assert {(r.id, r.g, r.v) for r in vt.read().collect()} == want
    assert {
        (r.id, r.g, r.v) for r in DL.read_delta(spark, vt.path).collect()
    } == want
    # both streaming sources inject partition values (fresh table so
    # the drains see only clean appends)
    t2 = versioned_table(spark, str(tmp_path / "p2"), use_delta=False)
    t2.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, g string, v long"
        ),
        mode="overwrite",
        timestamp="2026-01-01T00:00:00",
        partition_by=["g"],
    )
    for fmt, sub in (("versionedcdf", "c"), ("deltastream", "d")):
        out = str(tmp_path / f"out_{sub}")
        q = (
            spark.readStream.format(fmt)
            .option("path", t2.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckp_{sub}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert sorted(
            (r.id, r.g, r.v) for r in spark.read.parquet(out).collect()
        ) == [(1, "a", 10), (2, "b", 20)], fmt


def test_partitioned_rename_partition_column(spark, vt):
    """Renaming a PARTITION column stays metadata-only: the hive dirs
    keep the frozen physical name, partition_by follows the logical
    rename, and dropping a partition column refuses."""
    vt.write(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, g string"
        ),
        mode="overwrite",
        timestamp="2026-01-01T00:00:00",
        partition_by=["g"],
    )
    vt.rename_column("g", "grp", timestamp="2026-01-02T00:00:00")
    got = vt.read()
    assert got.columns == ["id", "grp"]
    assert sorted((r.id, r.grp) for r in got.collect()) == [
        (1, "a"), (2, "b"),
    ]
    # appends keep working: logical frame, physical dirs
    vt.write(
        spark.createDataFrame([(3, "c")], "id long, grp string"),
        timestamp="2026-01-03T00:00:00",
    )
    assert sorted(
        (r.id, r.grp) for r in DL.read_delta(spark, vt.path).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    with pytest.raises(ValueError, match="partition column"):
        vt.drop_column("grp")


def test_dv_merge_is_one_commit_touching_only_masks(spark, vt):
    """Merge-on-read MERGE (upsert use_dv=True — the modern Delta
    MERGE): one commit masks matched rows and appends the source;
    untouched data files are never rewritten."""
    import os

    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]),
        timestamp="2026-01-01T00:00:00",
    )
    root = vt.path[len("file:"):] if vt.path.startswith("file:") else vt.path
    before = sorted(os.listdir(f"{root}/data"))
    src = spark.createDataFrame(
        [(3, "U3"), (7, "U7"), (100, "N")], "id long, val string"
    )
    v = vt.upsert(src, ["id"], timestamp="2026-01-02T00:00:00", use_dv=True)
    assert v == 2
    after = sorted(os.listdir(f"{root}/data"))
    assert before[0] in after and len(after) == len(before) + 1
    want = sorted(
        [(i, f"v{i}") for i in range(10) if i not in (3, 7)]
        + [(3, "U3"), (7, "U7"), (100, "N")]
    )
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    assert vt.history()[0]["operation"] == "merge"
    # CDF: matched pre-images + full source post-image
    kinds = sorted(
        (r._change_type, r.id) for r in vt.table_changes(1, 2).collect()
    )
    assert kinds == [
        ("update_postimage", 3),
        ("update_postimage", 7),
        ("update_postimage", 100),
        ("update_preimage", 3),
        ("update_preimage", 7),
    ]
    # a no-match merge is a pure insert (append commit, still labeled
    # merge)
    v2 = vt.upsert(
        _df(spark, [(200, "X")]), ["id"],
        timestamp="2026-01-03T00:00:00", use_dv=True,
    )
    assert v2 == 3 and vt.history()[0]["operation"] == "merge"
    assert (200, "X") in set(_rows(vt.read()))
    # schema enforcement still applies
    with pytest.raises(ValueError, match="schema"):
        vt.upsert(
            spark.createDataFrame([(1, 2.0)], "id long, val double"),
            ["id"],
            use_dv=True,
        )


def test_optimize_zorder_prunes_on_every_clustered_column(spark, vt):
    """OPTIMIZE ZORDER BY (compact zorder_by=[x, y]): after the
    rewrite, a point filter on EITHER column touches a strict subset
    of files (per-add stats in the mirror prove it for external
    readers too) — linear clustering can only do that for the
    leading column. Rows are bit-identical and the commit stays
    dataChange=false."""
    df = spark.range(40000).select(
        F.col("id").cast("long"),
        (F.col("id") % 200).cast("long").alias("x"),
        ((F.col("id") * 7919) % 200).cast("long").alias("y"),
    )
    vt.write(df, mode="overwrite", timestamp="2026-01-01T00:00:00")
    vt.compact(
        target_file_bytes=20_000,
        timestamp="2026-01-02T00:00:00",
        zorder_by=["x", "y"],
    )
    adds = DL.delta_snapshot(spark, vt.path)["adds"]
    assert len(adds) >= 4

    def touched(col, val):
        n = 0
        for a in adds:
            st = json.loads(a["stats"])
            if st["minValues"][col] <= val <= st["maxValues"][col]:
                n += 1
        return n

    assert touched("x", 17) < len(adds)
    assert touched("y", 17) < len(adds)
    assert vt.read().count() == 40000
    assert sorted(
        r.id for r in vt.read().filter(F.col("x") == 17).collect()
    ) == [i for i in range(40000) if i % 200 == 17]
    assert vt.history()[0]["operation"] == "optimize"
    assert vt._commits()[-1].data_change is False
    with pytest.raises(ValueError, match="numeric"):
        vt.compact(zorder_by=["nope"])


def test_restore_to_version(spark, vt):
    """RESTORE TABLE TO VERSION: one metadata commit re-points the
    live set (deletion-vector masks included) at the target
    snapshot; nothing rewritten, restore itself time-travelable,
    both readers agree."""
    vt.write(
        _df(spark, [(i, f"v{i}") for i in range(10)]),
        timestamp="2026-01-01T00:00:00",
    )
    vt.delete_where(
        F.col("id") < 4, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    vt.write(_df(spark, [(100, "x")]), timestamp="2026-01-03T00:00:00")
    post_delete = _rows(vt.read(version=2))
    # restore to the masked state (version 2): the DV mask must ride
    # along in the restore commit
    v = vt.restore(2, timestamp="2026-01-04T00:00:00")
    assert v == 4
    assert _rows(vt.read()) == post_delete
    assert _rows(DL.read_delta(spark, vt.path)) == post_delete
    assert vt.history()[0]["operation"] == "restore"
    # restore to version 1: the full pre-delete table comes back —
    # the DELETE was only ever logical
    vt.restore(1, timestamp="2026-01-05T00:00:00")
    assert _rows(vt.read()) == [(i, f"v{i}") for i in range(10)]
    assert _rows(DL.read_delta(spark, vt.path)) == _rows(vt.read())
    # the RESTORE is itself time-travelable (version 4 still shows
    # the restored-to-2 state), and the pre-restore tip (version 3)
    # still shows the appended row
    assert _rows(vt.read(version=4)) == post_delete
    assert (100, "x") in set(_rows(vt.read(version=3)))
    with pytest.raises(ValueError, match="does not exist"):
        vt.restore(99)


def test_optimize_zorder_string_and_date_columns(spark, vt):
    """Round 12: ZORDER BY accepts STRING (first-7-byte prefix
    quantization — real OPTIMIZE range-ids strings) and DATE
    (datediff day number — CAST(date AS double) is forbidden by
    Spark, which made the r11 gate crash on the very type it
    claimed). Point filters on either column must skip files via
    mirror stats, rows stay bit-identical."""
    df = spark.range(40000).select(
        F.col("id").cast("long"),
        F.concat(
            F.lit("SEG"), F.lpad((F.col("id") % 20).cast("string"), 2, "0")
        ).alias("seg"),
        F.date_add(
            F.lit("2020-01-01").cast("date"),
            ((F.col("id") * 7919) % 365).cast("int"),
        ).alias("d"),
    )
    vt.write(df, mode="overwrite", timestamp="2026-01-01T00:00:00")
    vt.compact(
        target_file_bytes=20_000,
        timestamp="2026-01-02T00:00:00",
        zorder_by=["seg", "d"],
    )
    adds = DL.delta_snapshot(spark, vt.path)["adds"]
    assert len(adds) >= 4

    def touched(col, val):
        n = 0
        for a in adds:
            st = json.loads(a["stats"])
            if st["minValues"][col] <= val <= st["maxValues"][col]:
                n += 1
        return n

    assert touched("seg", "SEG07") < len(adds)
    assert touched("d", "2020-06-15") < len(adds)
    assert vt.read().count() == 40000
    assert sorted(
        r.id for r in vt.read().filter(F.col("seg") == "SEG07").collect()
    ) == [i for i in range(40000) if i % 20 == 7]


def test_optimize_zorder_rank_quantizes_long_prefix_strings(spark, vt):
    """VERDICT r12 #7: URL-shaped keys share a long common prefix, so
    round 12's first-7-byte quantization provably maps EVERY key to
    one bucket (asserted below) — zero clustering power on exactly
    the crawl-corpus keys zorder exists for. The round-13 sampled
    rank quantization must prune a point lookup anyway."""
    df = spark.range(40000).select(
        F.col("id").cast("long"),
        F.concat(
            F.lit("https://crawl.example.com/corpus/2026/shard="),
            F.lpad((F.col("id") % 40).cast("string"), 4, "0"),
            F.lit("/doc"),
        ).alias("url"),
    )
    # the OLD prefix integer is constant across all 40 keys: prefix
    # quantization cannot separate them even in principle
    old_prefix = F.conv(
        F.hex(
            F.rpad(
                F.substring(F.col("url").cast("binary"), 1, 7),
                7,
                F.lit(bytes([0])),
            )
        ),
        16,
        10,
    )
    assert df.select(old_prefix.alias("p")).distinct().count() == 1
    vt.write(df, mode="overwrite", timestamp="2026-01-01T00:00:00")
    vt.compact(
        target_file_bytes=20_000,
        timestamp="2026-01-02T00:00:00",
        zorder_by=["url"],
    )
    adds = DL.delta_snapshot(spark, vt.path)["adds"]
    assert len(adds) >= 4
    val = "https://crawl.example.com/corpus/2026/shard=0007/doc"
    touched = sum(
        1
        for a in adds
        for st in [json.loads(a["stats"])]
        if st["minValues"]["url"] <= val <= st["maxValues"]["url"]
    )
    # a point lookup must SKIP almost everything — under the r12
    # prefix scheme every file spanned the full (constant-bucket)
    # url range and touched == len(adds)
    assert touched <= 2
    assert vt.read().count() == 40000
    assert sorted(
        r.id for r in vt.read().filter(F.col("url") == val).collect()
    ) == [i for i in range(40000) if i % 40 == 7]


def test_spec_paths_percent_encoded_and_absolute(spark, tmp_path):
    """PROTOCOL.md: add/remove paths are percent-encoded and may be
    ABSOLUTE (shallow clones). A foreign log using both forms must
    read (round 12; previously an encoded space or absolute add
    misread)."""
    root = str(tmp_path / "enc")
    other = str(tmp_path / "elsewhere")
    os.makedirs(f"{root}/_delta_log")
    os.makedirs(other)
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{root}/stage1")
    spark.createDataFrame([(2,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{other}/stage2")
    import glob as _glob

    f1 = _glob.glob(f"{root}/stage1/part-*.parquet")[0]
    f2 = _glob.glob(f"{other}/stage2/part-*.parquet")[0]
    # give the first file a name that NEEDS encoding
    weird = f"{root}/my data 100%.parquet"
    os.rename(f1, weird)
    schema = spark.createDataFrame([], "id long").schema
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "enc",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "my%20data%20100%25.parquet",  # encoded relative
                "partitionValues": {},
                "size": os.path.getsize(weird),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
        {
            "add": {
                "path": f2,  # absolute, outside the table root
                "partitionValues": {},
                "size": os.path.getsize(f2),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    assert _rows(DL.read_delta(spark, root)) == [(1,), (2,)]


def test_shallow_clone_is_metadata_only_and_independent(spark, vt, tmp_path):
    """SHALLOW CLONE (round 12): one version-0 commit of absolute-path
    adds — zero data files copied; deletion-vector masks carry over
    (rewritten to absolute 'p' storage); later writes to the SOURCE
    never change the clone; the clone streams through deltastream."""
    from etl_deltalake_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    df = spark.range(2000).select(
        F.col("id").cast("long"),
        (F.col("id") % 4).cast("long").alias("p"),
    )
    vt.write(df, mode="overwrite", partition_by=["p"],
             timestamp="2026-01-01T00:00:00")
    vt.delete_where(F.col("id") % 10 == 0,
                    timestamp="2026-01-02T00:00:00", use_dv=True)
    dest = str(tmp_path / "clone")
    DL.shallow_clone(spark, vt.path, dest,
                     timestamp="2026-01-03T00:00:00")
    src_rows = _rows(DL.read_delta(spark, vt.path))
    assert _rows(DL.read_delta(spark, dest)) == src_rows
    assert len(src_rows) == 2000 - 200
    # metadata-only: the clone root holds ONLY the log
    assert os.listdir(dest.replace("file:", "")) == ["_delta_log"]
    # independence: source evolves, clone does not
    vt.write(
        spark.createDataFrame([(99999, 1)], "id long, p long"),
        mode="append", timestamp="2026-01-04T00:00:00",
    )
    assert len(_rows(DL.read_delta(spark, vt.path))) == 1801
    assert _rows(DL.read_delta(spark, dest)) == src_rows
    # double clone to the same dest refuses
    with pytest.raises(ValueError, match="already has"):
        DL.shallow_clone(spark, vt.path, dest)
    # the clone streams (initial snapshot = its version-0 live set)
    spark.dataSource.register(DeltaStreamDataSource)
    out, ckp = str(tmp_path / "out"), str(tmp_path / "ckp")
    q = (
        spark.readStream.format("deltastream")
        .option("path", dest)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.id, r.p) for r in spark.read.parquet(out).collect()
    )
    assert got == src_rows


def test_multipart_checkpoint_written_and_replayed(
    spark, vt, tmp_path, monkeypatch
):
    """Round 12: above _CHECKPOINT_PART_MAX action rows the mirror
    writes the spec's SHARDED classic checkpoint
    (%020d.checkpoint.%010d.%010d.parquet + parts in
    _last_checkpoint) — at 100 TB a single checkpoint parquet over
    millions of adds is the metadata bottleneck. Both readers (JVM
    replay and the pure-python deltastream planner) resolve from the
    parts after log cleanup."""
    monkeypatch.setattr(DL, "_CHECKPOINT_PART_MAX", 4)
    for i in range(10):  # 10th commit checkpoints at delta version 9
        vt.write(
            spark.createDataFrame([(i, f"r{i}")], "id long, val string")
            .coalesce(1),
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    log = f"{vt.path}/_delta_log".replace("file:", "")
    parts = sorted(
        n for n in os.listdir(log)
        if not n.startswith(".")
        and ".checkpoint." in n
        and n.endswith(".parquet")
        and len(n.split(".")) == 5
    )
    assert len(parts) >= 2  # 12 action rows / 4 per part
    lc = json.load(open(f"{log}/_last_checkpoint"))
    assert lc["parts"] == len(parts)
    assert not os.path.exists(
        f"{log}/{9:020d}.checkpoint.parquet"
    )  # sharded form only
    assert DL.cleanup_log(spark, vt.path) == 9
    assert _rows(DL.read_delta(spark, vt.path)) == [
        (i, f"r{i}") for i in range(10)
    ]
    from etl_deltalake_spark.sources.delta_stream import _snapshot_py

    snap = _snapshot_py(vt.path)
    assert snap["version"] == 9
    assert len(snap["adds"]) == 10


def test_v2_checkpoint_written_and_replayed(spark, tmp_path):
    """Round 12 writer side (the reader handled v2 since r11): a
    ``v2_checkpoints=True`` table mirrors the V2 NAMED layout —
    manifest %020d.checkpoint.<uuid>.json (checkpointMetadata +
    protocol/metaData/txn + sidecar refs) with file actions in
    _delta_log/_sidecars/ parquet; protocol carries the v2Checkpoint
    feature; both readers resolve from it after log cleanup."""
    t = versioned_table(
        spark, str(tmp_path / "v2"), use_delta=False, v2_checkpoints=True
    )
    for i in range(10):
        t.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
            txn=("app", i) if i == 4 else None,
        )
    log = f"{t.path}/_delta_log".replace("file:", "")
    manifests = [
        n for n in os.listdir(log)
        if not n.startswith(".")
        and len(n.split(".")) == 4
        and n.split(".")[1] == "checkpoint"
        and n.endswith(".json")
    ]
    assert len(manifests) == 1
    assert not os.path.exists(f"{log}/{9:020d}.checkpoint.parquet")
    assert os.path.isdir(f"{log}/_sidecars")
    snap = DL.delta_snapshot(spark, t.path)
    assert "v2Checkpoint" in snap["protocol"]["readerFeatures"]
    assert DL.cleanup_log(spark, t.path) == 9
    assert _rows(DL.read_delta(spark, t.path)) == [
        (i, f"r{i}") for i in range(10)
    ]
    snap = DL.delta_snapshot(spark, t.path)
    assert snap["txns"] == {"app": 4}
    from etl_deltalake_spark.sources.delta_stream import _snapshot_py

    psnap = _snapshot_py(t.path)
    assert psnap["version"] == 9 and len(psnap["adds"]) == 10


def test_v2_checkpoint_shards_sidecars(spark, tmp_path, monkeypatch):
    """ADVICE r13 (low): the v2 writer must apply
    _CHECKPOINT_PART_MAX to sidecars — one unbounded sidecar parquet
    re-creates the single-file metadata bottleneck the v2 layout
    exists to avoid. Cap 4 → the manifest carries multiple sidecar
    actions and both readers still resolve the full live set."""
    monkeypatch.setattr(DL, "_CHECKPOINT_PART_MAX", 4)
    t = versioned_table(
        spark, str(tmp_path / "v2s"), use_delta=False,
        v2_checkpoints=True,
    )
    for i in range(10):
        t.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    log = f"{t.path}/_delta_log".replace("file:", "")
    manifest = next(
        n for n in os.listdir(log)
        if len(n.split(".")) == 4
        and n.split(".")[1] == "checkpoint"
        and n.endswith(".json")
    )
    sidecars = [
        json.loads(line)["sidecar"]
        for line in open(f"{log}/{manifest}", encoding="utf-8")
        if line.strip() and "sidecar" in json.loads(line)
    ]
    assert len(sidecars) >= 3  # 10 adds / 4 per sidecar
    on_disk = [
        n for n in os.listdir(f"{log}/_sidecars")
        if not n.startswith(".")
    ]
    assert sorted(on_disk) == sorted(s["path"] for s in sidecars)
    assert DL.cleanup_log(spark, t.path) == 9
    assert _rows(DL.read_delta(spark, t.path)) == [
        (i, f"r{i}") for i in range(10)
    ]
    from etl_deltalake_spark.sources.delta_stream import _snapshot_py

    psnap = _snapshot_py(t.path)
    assert psnap["version"] == 9 and len(psnap["adds"]) == 10


def test_golden_cdf_clone_v2_conformance(spark, tmp_path, monkeypatch):
    """Round-13 golden extension (VERDICT r12 #2): byte-pin the
    action classes external readers would trip on that the original
    golden never exercised — cdc actions + _change_data layout,
    DV-carrying removes, percent-encoded partition paths, shallow
    clone (absolute encoded adds + DV descriptors rewritten to
    absolute ``p`` storage), the v2 named-checkpoint manifest, and
    the multi-part classic checkpoint file names."""
    golden_path = os.path.join(
        os.path.dirname(__file__), "data", "golden_delta_log.json"
    )
    with open(golden_path, encoding="utf-8") as f:
        golden = json.load(f)

    src = str(tmp_path / "gcdf")
    t = _golden_script_cdf(spark, src)
    for _, a in DL.delta_log_actions(spark, t.path):
        kind = next(iter(a))
        assert kind in _SPEC_FIELDS, f"unknown action {kind}"
        keys = set(a[kind])
        assert _SPEC_FIELDS[kind] <= keys
        assert keys <= _SPEC_FIELDS[kind] | _SPEC_OPTIONAL.get(kind, set())
    assert _normalize_stream(spark, t.path) == golden["cdf_json_actions"]

    # shallow clone at the post-DV snapshot: absolute encoded adds,
    # DV storage rewritten from 'u' to absolute 'p'
    dest = str(tmp_path / "gclone")
    DL.shallow_clone(
        spark, t.path, dest, timestamp="2026-02-10T00:00:00", version=1
    )
    assert (
        _normalize_stream(spark, dest, src=t.path)
        == golden["clone_json_actions"]
    )
    # the clone reads the source's v1 snapshot, source-independent
    assert sorted(
        (r.id, r.p, r.val)
        for r in DL.read_delta(spark, dest).collect()
    ) == [(2, "a b", "y"), (3, "100%", "z")]

    # v2 named checkpoint manifest shapes (sidecars sharded at 4)
    monkeypatch.setattr(DL, "_CHECKPOINT_PART_MAX", 4)
    tv2 = versioned_table(
        spark, str(tmp_path / "gv2"), use_delta=False,
        v2_checkpoints=True,
    )
    for i in range(10):
        tv2.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-03-{i + 1:02d}T00:00:00",
        )
    log = f"{tv2.path}/_delta_log".replace("file:", "")
    manifest = next(
        n for n in os.listdir(log)
        if len(n.split(".")) == 4
        and n.split(".")[1] == "checkpoint"
        and n.endswith(".json")
    )
    with open(f"{log}/{manifest}", encoding="utf-8") as f:
        assert _normalize_manifest(f) == golden["v2_manifest_actions"]

    # multi-part classic checkpoint: exact (deterministic) file names
    tmp_t = versioned_table(
        spark, str(tmp_path / "gmp"), use_delta=False
    )
    for i in range(10):
        tmp_t.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-04-{i + 1:02d}T00:00:00",
        )
    mlog = f"{tmp_t.path}/_delta_log".replace("file:", "")
    parts = sorted(
        n for n in os.listdir(mlog)
        if not n.startswith(".")
        and ".checkpoint." in n
        and n.endswith(".parquet")
        and len(n.split(".")) == 5
    )
    assert parts == golden["multipart_checkpoint_files"]


def test_foreign_log_with_writer_only_features_reads(spark, tmp_path):
    """Writer-only protocol features (rowTracking, domainMetadata,
    icebergCompatV2, ...) constrain WRITERS; a reader must ignore
    them — plus ``domainMetadata`` actions and row-tracking fields
    (baseRowId / defaultRowCommitVersion) on adds — and still
    refuse unknown READER features (round 13 tolerance pin; real
    delta-spark tables carry these routinely)."""
    import glob as _glob

    root = str(tmp_path / "ft")
    os.makedirs(f"{root}/_delta_log")
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{root}/stage")
    f1 = _glob.glob(f"{root}/stage/part-*.parquet")[0]
    os.rename(f1, f"{root}/d1.parquet")
    schema = spark.createDataFrame([], "id long").schema
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": [
                    "deletionVectors",
                    "rowTracking",
                    "domainMetadata",
                    "icebergCompatV2",
                    "appendOnly",
                    "invariants",
                ],
            }
        },
        {
            "metaData": {
                "id": "ft",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": [],
                "configuration": {"delta.enableRowTracking": "true"},
                "createdTime": 0,
            }
        },
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": "{\"rowIdHighWaterMark\":1}",
                "removed": False,
            }
        },
        {
            "add": {
                "path": "d1.parquet",
                "partitionValues": {},
                "size": os.path.getsize(f"{root}/d1.parquet"),
                "modificationTime": 0,
                "dataChange": True,
                # row-tracking per-add fields a real writer emits
                "baseRowId": 0,
                "defaultRowCommitVersion": 0,
            }
        },
        {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
    ]
    with open(f"{root}/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    assert _rows(DL.read_delta(spark, root)) == [(1,), (2,)]
    snap = DL.delta_snapshot(spark, root)
    assert snap["version"] == 0
    # the pure-python streaming planner tolerates them too
    from etl_deltalake_spark.sources.delta_stream import _snapshot_py

    psnap = _snapshot_py(root)
    assert len(psnap["adds"]) == 1
    # an unknown READER feature still refuses honestly
    actions[0] = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "futureFeatureX"],
            "writerFeatures": ["deletionVectors"],
        }
    }
    root2 = str(tmp_path / "ft2")
    os.makedirs(f"{root2}/_delta_log")
    with open(f"{root2}/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="futureFeatureX"):
        DL.read_delta(spark, root2)


def test_cleanup_sweeps_superseded_checkpoint_generations(
    spark, tmp_path, monkeypatch
):
    """Round 13: a long-lived table checkpoints every N commits —
    cleanup must delete SUPERSEDED checkpoint generations (classic
    parquet, multi-part parts, v2 manifests + their sidecars) along
    with the commit JSONs, keeping the newest generation and its
    sidecars; both readers still resolve. Real Delta's metadata
    cleanup does the same."""
    monkeypatch.setattr(DL, "_CHECKPOINT_PART_MAX", 4)
    # classic + multipart generations
    t = versioned_table(spark, str(tmp_path / "c"), use_delta=False)
    for i in range(20):  # checkpoints at delta versions 9 and 19
        t.write(
            spark.createDataFrame([(i,)], "id long").coalesce(1),
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    log = f"{t.path}/_delta_log".replace("file:", "")
    before = [n for n in os.listdir(log) if ".checkpoint." in n]
    assert any(n.startswith(f"{9:020d}.") for n in before)
    assert DL.cleanup_log(spark, t.path) == 19
    after = [n for n in os.listdir(log) if ".checkpoint." in n]
    assert not any(n.startswith(f"{9:020d}.") for n in after)
    assert any(n.startswith(f"{19:020d}.") for n in after)
    assert _rows(DL.read_delta(spark, t.path)) == [(i,) for i in range(20)]

    # v2 generations: the old manifest AND its sidecars go; the new
    # manifest's sidecars survive and both readers resolve
    tv = versioned_table(
        spark, str(tmp_path / "v"), use_delta=False, v2_checkpoints=True
    )
    for i in range(20):
        tv.write(
            spark.createDataFrame([(i, f"r{i}")], "id long, val string")
            .coalesce(1),
            timestamp=f"2026-02-{i + 1:02d}T00:00:00",
        )
    vlog = f"{tv.path}/_delta_log".replace("file:", "")
    n_side_before = len(
        [n for n in os.listdir(f"{vlog}/_sidecars") if n.endswith(".parquet")]
    )
    assert DL.cleanup_log(spark, tv.path) == 19
    manifests = [
        n for n in os.listdir(vlog)
        if len(n.split(".")) == 4 and n.endswith(".json")
    ]
    assert len(manifests) == 1 and manifests[0].startswith(f"{19:020d}.")
    live = {
        json.loads(line)["sidecar"]["path"]
        for line in open(f"{vlog}/{manifests[0]}", encoding="utf-8")
        if line.strip() and "sidecar" in json.loads(line)
    }
    on_disk = {
        n for n in os.listdir(f"{vlog}/_sidecars") if n.endswith(".parquet")
    }
    assert on_disk == live  # old generation's sidecars swept
    assert len(on_disk) < n_side_before
    assert _rows(DL.read_delta(spark, tv.path)) == [
        (i, f"r{i}") for i in range(20)
    ]
    from etl_deltalake_spark.sources.delta_stream import _snapshot_py

    psnap = _snapshot_py(tv.path)
    assert psnap["version"] == 19 and len(psnap["adds"]) == 20


def test_generated_columns(spark, vt):
    """GENERATED ALWAYS AS (round 13, spec
    ``delta.generationExpression``): omitted generated columns are
    computed on write, provided values must MATCH the expression
    (Delta's rule), the mirror's schemaString carries the expression
    per field and the protocol gains the writer-only
    generatedColumns feature, and a merge-on-read upsert source
    omitting the column gets it computed too."""
    vt.write(
        spark.createDataFrame(
            [(1, 100), (2, 200)], "id long, cents long"
        ).coalesce(1),
        timestamp="2026-01-01T00:00:00",
    )
    # existing data must satisfy the expression to attach it
    with pytest.raises(ValueError, match="violate"):
        vt.set_generated_column("cents", "id * 1000")
    vt.set_generated_column("cents", "id * 100")
    # omitted → computed
    vt.write(
        spark.createDataFrame([(3,)], "id long").coalesce(1),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    # provided-but-wrong → refused; provided-and-right → fine
    with pytest.raises(ValueError, match="do not match"):
        vt.write(
            spark.createDataFrame(
                [(4, 999)], "id long, cents long"
            ).coalesce(1),
            mode="append",
            timestamp="2026-01-03T00:00:00",
        )
    vt.write(
        spark.createDataFrame(
            [(4, 400)], "id long, cents long"
        ).coalesce(1),
        mode="append",
        timestamp="2026-01-03T00:00:00",
    )
    # merge-on-read upsert: source omits the generated column
    vt.upsert(
        spark.createDataFrame([(2,), (10,)], "id long"),
        ["id"], timestamp="2026-01-04T00:00:00", use_dv=True,
    )
    want = [(1, 100), (2, 200), (3, 300), (4, 400), (10, 1000)]
    assert sorted(map(tuple, vt.read().collect())) == want
    assert sorted(
        map(tuple, DL.read_delta(spark, vt.path).collect())
    ) == want
    snap = DL.delta_snapshot(spark, vt.path)
    assert "generatedColumns" in snap["protocol"]["writerFeatures"]
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(snap["schema_json"])["fields"]
    }
    assert fields["cents"]["delta.generationExpression"] == "id * 100"
    assert "delta.generationExpression" not in fields["id"]


def test_update_where_recomputes_generated(spark, vt):
    """Round 14 (VERDICT r13 #2): UPDATE recomputes every generated
    column it does not explicitly SET — Delta writer semantics — in
    BOTH copy-on-write and merge-on-read forms, and the recomputed
    value is visible through the custom read AND the spec reader.
    Explicitly-SET mismatches still refuse, in both forms."""
    vt.write(
        spark.createDataFrame(
            [(1, 100), (2, 200), (3, 300)], "id long, cents long"
        ).coalesce(1),
        timestamp="2026-01-01T00:00:00",
    )
    vt.set_generated_column("cents", "id * 100")
    # copy-on-write: updating the SOURCE column recomputes cents
    assert (
        vt.update_where(
            F.col("id") == 2, {"id": F.lit(20)},
            timestamp="2026-01-02T00:00:00",
        )
        == 1
    )
    want = [(1, 100), (3, 300), (20, 2000)]
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # merge-on-read: same rule through one DV commit
    assert (
        vt.update_where(
            F.col("id") == 3, {"id": F.lit(30)},
            timestamp="2026-01-03T00:00:00", use_dv=True,
        )
        == 1
    )
    want = [(1, 100), (20, 2000), (30, 3000)]
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want
    # explicitly SET and inconsistent with the expression → refused
    with pytest.raises(ValueError, match="do not match"):
        vt.update_where(
            F.col("id") == 1,
            {"id": F.lit(10), "cents": F.lit(999)},
            timestamp="2026-01-04T00:00:00",
        )
    with pytest.raises(ValueError, match="do not match"):
        vt.update_where(
            F.col("id") == 1,
            {"id": F.lit(10), "cents": F.lit(999)},
            timestamp="2026-01-04T00:00:00", use_dv=True,
        )
    # explicitly SET and consistent → accepted
    assert (
        vt.update_where(
            F.col("id") == 1,
            {"id": F.lit(10), "cents": F.lit(1000)},
            timestamp="2026-01-05T00:00:00", use_dv=True,
        )
        == 1
    )
    want = [(10, 1000), (20, 2000), (30, 3000)]
    assert _rows(vt.read()) == want
    assert _rows(DL.read_delta(spark, vt.path)) == want


def test_golden_r14_conformance(spark, tmp_path, monkeypatch):
    """Round-14 golden extension: identity metadata (moving
    highWaterMark), generated+identity feature pair, REORG PURGE
    action shapes, and the swept two-generation checkpoint layout —
    all byte-pinned against tests/data/golden_delta_log.json. The
    checkpoint shards at 4 adds/part (the regen script's setting), so
    the swept layout pins the multi-part × sweep composition."""
    monkeypatch.setattr(DL, "_CHECKPOINT_PART_MAX", 4)
    golden_path = os.path.join(
        os.path.dirname(__file__), "data", "golden_delta_log.json"
    )
    with open(golden_path, encoding="utf-8") as f:
        golden = json.load(f)

    t = _golden_script_r14(spark, str(tmp_path / "g14"))
    for _, a in DL.delta_log_actions(spark, t.path):
        kind = next(iter(a))
        assert kind in _SPEC_FIELDS, f"unknown action {kind}"
        keys = set(a[kind])
        assert _SPEC_FIELDS[kind] <= keys
        assert keys <= _SPEC_FIELDS[kind] | _SPEC_OPTIONAL.get(kind, set())
    assert _normalize_stream(spark, t.path) == golden["r14_json_actions"]
    # custom and spec reads agree after allocation + purge + tail
    want = _rows(t.read())
    assert _rows(DL.read_delta(spark, t.path)) == want
    assert len(want) == 18  # 3 initial - 1 deleted + 16 tail

    # swept layout: two checkpoint generations, older one collected
    assert DL.cleanup_log(spark, t.path) == golden["r14_swept_json_count"]
    mlog = f"{t.path}/_delta_log".replace("file:", "")
    assert sorted(
        n
        for n in os.listdir(mlog)
        if ".checkpoint." in n and not n.startswith(".")
    ) == golden["r14_swept_checkpoint_files"]
    assert (
        sorted({v for v, _ in DL.delta_log_actions(spark, t.path)})
        == golden["r14_surviving_json_versions"]
    )
    with open(f"{mlog}/_last_checkpoint", encoding="utf-8") as f:
        assert (
            json.load(f)["version"]
            == golden["r14_last_checkpoint_version"]
        )
    # the swept log still reads, and identity metadata survived
    assert _rows(DL.read_delta(spark, t.path)) == want
    snap = DL.delta_snapshot(spark, t.path)
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(snap["schema_json"])["fields"]
    }
    assert fields["uid"]["delta.identity.step"] == 3
    assert fields["twice"]["delta.generationExpression"] == "id * 2"
    assert "identityColumns" in snap["protocol"]["writerFeatures"]
    assert "generatedColumns" in snap["protocol"]["writerFeatures"]


def test_golden_r14b_conformance(spark, tmp_path):
    """Round-14 third-wave golden pin: row-tracking add fields,
    domainMetadata watermark/clustering actions, and the
    clustering+rowTracking+domainMetadata protocol, byte-level."""
    golden_path = os.path.join(
        os.path.dirname(__file__), "data", "golden_delta_log.json"
    )
    with open(golden_path, encoding="utf-8") as f:
        golden = json.load(f)
    t = _golden_script_r14b(spark, str(tmp_path / "g14b"))
    for _, a in DL.delta_log_actions(spark, t.path):
        kind = next(iter(a))
        assert kind in _SPEC_FIELDS, f"unknown action {kind}"
        keys = set(a[kind])
        assert _SPEC_FIELDS[kind] <= keys
        assert keys <= _SPEC_FIELDS[kind] | _SPEC_OPTIONAL.get(kind, set())
    assert _normalize_stream(spark, t.path) == golden["r14b_json_actions"]
    want = [(2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f")]
    assert _rows(t.read()) == want
    assert _rows(DL.read_delta(spark, t.path)) == want
