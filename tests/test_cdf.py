"""Change data feed as the SPEC defines it (round 12): CDF-enabled
tables write their DML change rows (+ ``_change_type``) under
``_change_data/`` and log ``cdc`` actions, so (a) this engine's
``table_changes`` serves recorded changes in O(changes) instead of
re-deriving them, and (b) ANY spec reader — here ``read_delta_cdf``,
the in-repo twin of delta-spark's ``readChangeFeed`` — gets identical
CDF from the log alone. Derivation rules for non-CDF commits
(pure-add → insert, pure-remove → delete, rewrite → honest refusal)
follow delta-spark. Reference analogue: the reference's Delta tables
(main.py:414,465) gain CDF with one table property; this is that
property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.versioned import versioned_table


def _df(spark, rows, ddl="id long, val string"):
    return spark.createDataFrame(rows, ddl).coalesce(1)


def _changes(df):
    return sorted(
        tuple(r) for r in df.select(
            "id", "val", "_change_type", "_commit_version"
        ).collect()
    )


@pytest.fixture()
def pair(spark, tmp_path):
    """A CDF table and its non-CDF twin, driven through the SAME DML
    script — table_changes must agree (recorded vs derived)."""
    a = versioned_table(spark, str(tmp_path / "cdf"), use_delta=False,
                        cdf=True)
    b = versioned_table(spark, str(tmp_path / "plain"), use_delta=False)
    for t in (a, b):
        t.write(
            _df(spark, [(i, f"v{i}") for i in range(20)]),
            timestamp="2026-01-01T00:00:00",
        )
        t.delete_where(F.col("id") % 5 == 0,
                       timestamp="2026-01-02T00:00:00", use_dv=True)
        t.update_where(
            F.col("id") == 7, {"val": F.lit("SEVEN")},
            timestamp="2026-01-03T00:00:00", use_dv=True,
        )
        t.upsert(
            _df(spark, [(3, "merged"), (100, "new")]),
            ["id"], timestamp="2026-01-04T00:00:00", use_dv=True,
        )
    return a, b


def test_recorded_cdf_equals_derived_cdf(spark, pair):
    a, b = pair
    # the CDF table recorded cdc files on every DML commit
    assert all(c.cdc for c in a._commits()[1:])
    assert not any(c.cdc for c in b._commits())
    got = _changes(a.table_changes(1))
    derived = _changes(b.table_changes(1))
    # same rows, same versions; the RECORDED labels are strictly
    # finer: a merge's not-matched inserts are "insert", which the
    # add/remove derivation cannot distinguish from the rewritten
    # matched rows (it labels every fresh row update_postimage —
    # delta-spark cannot derive merge CDF at all)
    assert [(i, v, ver) for i, v, _, ver in got] == [
        (i, v, ver) for i, v, _, ver in derived
    ]
    finer = {(100, "new", "update_postimage", 4): (
        100, "new", "insert", 4)}
    assert got == sorted(finer.get(r, r) for r in derived)
    # spot checks: DV delete, update pre/post, merge insert
    assert (0, "v0", "delete", 2) in got
    assert (7, "v7", "update_preimage", 3) in got
    assert (7, "SEVEN", "update_postimage", 3) in got
    assert (100, "new", "insert", 4) in got
    assert (3, "v3", "update_preimage", 4) in got
    assert (3, "merged", "update_postimage", 4) in got


def test_spec_reader_serves_cdc_actions(spark, pair):
    a, _ = pair
    # the mirror carries spec cdc actions for every DML commit
    kinds = {
        v: {next(iter(x)) for x in acts}
        for v, acts in _group_actions(spark, a.path).items()
    }
    assert "cdc" in kinds[1] and "cdc" in kinds[2] and "cdc" in kinds[3]
    # and a spec reader reconstructs the identical change feed
    # (delta versions are 0-based: custom version V = delta V-1)
    spec = DL.read_delta_cdf(spark, a.path, 0)
    got = sorted(
        (r.id, r.val, r._change_type, r._commit_version + 1)
        for r in spec.collect()
    )
    assert got == _changes(a.table_changes(1))
    # timestamps come from commitInfo (deterministic caller clock)
    ts = {
        r._commit_version: r._commit_timestamp for r in spec.collect()
    }
    assert ts[1] == DL._iso_to_millis("2026-01-02T00:00:00")


def _group_actions(spark, path):
    by: dict[int, list] = {}
    for v, a in DL.delta_log_actions(spark, path):
        by.setdefault(v, []).append(a)
    return by


def test_spec_reader_derives_insert_and_refuses_rewrites(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "nocdf"), use_delta=False)
    t.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    t.write(_df(spark, [(2, "b")]), mode="append",
            timestamp="2026-01-02T00:00:00")
    # pure appends derive as inserts without cdc actions
    got = sorted(
        (r.id, r.val, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(spark, t.path, -1).collect()
    )
    assert got == [(1, "a", "insert", 0), (2, "b", "insert", 1)]
    # a rewrite (DV delete) without CDF refuses honestly
    t.delete_where(F.col("id") == 1, timestamp="2026-01-03T00:00:00",
                   use_dv=True)
    with pytest.raises(ValueError, match="enableChangeDataFeed"):
        DL.read_delta_cdf(spark, t.path, 1).collect()


def test_cow_delete_records_cdc_and_partitioned_layout(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "p"), use_delta=False,
                        cdf=True)
    t.write(
        spark.createDataFrame(
            [(i, i % 3, f"v{i}") for i in range(30)],
            "id long, p long, val string",
        ),
        mode="overwrite", partition_by=["p"],
        timestamp="2026-01-01T00:00:00",
    )
    # copy-on-write delete: an overwrite commit, readable as CDF only
    # because the cdc actions record the true change set
    n = t.delete_where(F.col("id") < 6, timestamp="2026-01-02T00:00:00")
    assert n == 6
    ch = t.table_changes(1)
    dels = sorted(
        (r.id, r.p) for r in ch.filter(
            F.col("_change_type") == "delete"
        ).collect()
    )
    assert dels == [(i, i % 3) for i in range(6)]
    # cdc files live under _change_data/<hive dirs>; partition values
    # round-trip through the action, and the spec reader agrees
    spec = DL.read_delta_cdf(spark, t.path, 0, 1)
    sdels = sorted(
        (r.id, r.p) for r in spec.filter(
            F.col("_change_type") == "delete"
        ).collect()
    )
    assert sdels == dels
    assert all(
        c["path"].startswith("_change_data/")
        for acts in _group_actions(spark, t.path).values()
        for a in acts
        for c in [a.get("cdc")]
        if c is not None
    )


def test_vacuum_collects_expired_cdc_files(spark, tmp_path):
    import os

    t = versioned_table(spark, str(tmp_path / "vac"), use_delta=False,
                        cdf=True)
    t.write(_df(spark, [(i, "x") for i in range(10)]),
            timestamp="2026-01-01T00:00:00")
    t.delete_where(F.col("id") == 0, timestamp="2026-01-02T00:00:00",
                   use_dv=True)
    t.write(_df(spark, [(50, "y")]), mode="append",
            timestamp="2026-01-03T00:00:00")
    root = t.path.replace("file:", "")
    n_before = sum(len(fs) for _, _, fs in os.walk(f"{root}/_change_data"))
    assert n_before >= 1
    t.vacuum(retain_versions=1)
    # the delete commit (v2) fell out of retention; its cdc file went
    n_after = sum(len(fs) for _, _, fs in os.walk(f"{root}/_change_data"))
    assert n_after < n_before
    assert t.read().count() == 10  # 10 - 1 deleted + 1 appended


def test_deltastream_read_change_feed(spark, tmp_path):
    """readChangeFeed streaming (round 12, delta-spark parity): a CDF
    table's DML commits STREAM their recorded change rows instead of
    refusing; appends derive as inserts; the initial snapshot labels
    current rows insert; a rewrite without cdc still refuses."""
    from etl_deltalake_spark.sources.delta_stream import (
        DeltaStreamDataSource,
    )

    spark.dataSource.register(DeltaStreamDataSource)
    t = versioned_table(spark, str(tmp_path / "cdfs"), use_delta=False,
                        cdf=True)
    t.write(_df(spark, [(i, f"v{i}") for i in range(10)]),
            timestamp="2026-01-01T00:00:00")
    t.delete_where(F.col("id") % 3 == 0,
                   timestamp="2026-01-02T00:00:00", use_dv=True)
    t.update_where(F.col("id") == 7, {"val": F.lit("SEVEN")},
                   timestamp="2026-01-03T00:00:00", use_dv=True)

    def drain(out, ckp, **opts):
        reader = (
            spark.readStream.format("deltastream")
            .option("path", t.path)
            .option("readChangeFeed", "true")
        )
        for k, v in opts.items():
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
        return sorted(
            (r.id, r.val, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()
        )

    # full replay: matches the SPEC batch CDF reader exactly
    got = drain(str(tmp_path / "o1"), str(tmp_path / "c1"),
                startingVersion="0")
    want = sorted(
        (r.id, r.val, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(spark, t.path, -1).collect()
    )
    assert got == want
    assert (0, "v0", "delete", 1) in got
    assert (7, "v7", "update_preimage", 2) in got
    assert (7, "SEVEN", "update_postimage", 2) in got
    # initial-snapshot mode: CURRENT rows, all labeled insert, masks on
    snap = drain(str(tmp_path / "o2"), str(tmp_path / "c2"))
    assert {ct for _, _, ct, _ in snap} == {"insert"}
    assert sorted(i for i, _, _, _ in snap) == [
        i for i in range(10) if i % 3 != 0
    ]
    # a non-CDF table's rewrite refuses even under readChangeFeed
    t2 = versioned_table(spark, str(tmp_path / "plain2"),
                         use_delta=False)
    t2.write(_df(spark, [(1, "a"), (2, "b")]),
             timestamp="2026-01-01T00:00:00")
    t2.delete_where(F.col("id") == 1, timestamp="2026-01-02T00:00:00",
                    use_dv=True)
    import re

    with pytest.raises(Exception, match="enableChangeDataFeed"):
        reader = (
            spark.readStream.format("deltastream")
            .option("path", t2.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "0")
        )
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "o3"))
            .option("checkpointLocation", str(tmp_path / "c3"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)


def test_spec_reader_derives_overwrite_as_insert_plus_delete(
    spark, tmp_path
):
    """ADVICE r13 (medium): plain INSERT OVERWRITE produces a commit
    with adds AND removes and no cdc actions — delta-spark's
    CDCReader derives it as adds-as-insert + removes-as-delete; the
    old reader refused, breaking CDF over the repo's own cdf=True
    tables. The partition value carries a space so the remove-path
    decode level is exercised too (ADVICE r13 low)."""
    t = versioned_table(spark, str(tmp_path / "ow"), use_delta=False,
                        cdf=True)
    t.write(
        spark.createDataFrame(
            [(1, "a b", "x"), (2, "a b", "y"), (3, "c", "z")],
            "id long, p string, val string",
        ).coalesce(1),
        mode="overwrite", partition_by=["p"],
        timestamp="2026-01-01T00:00:00",
    )
    t.write(
        spark.createDataFrame(
            [(9, "a b", "w")], "id long, p string, val string"
        ).coalesce(1),
        mode="overwrite", partition_by=["p"],
        timestamp="2026-01-02T00:00:00",
    )
    got = sorted(
        (r.id, r.p, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(spark, t.path, 0, 1).collect()
    )
    assert got == [
        (1, "a b", "delete", 1),
        (2, "a b", "delete", 1),
        (3, "c", "delete", 1),
        (9, "a b", "insert", 1),
    ]


def test_overwrite_of_dv_masked_file_deletes_only_live_rows(
    spark, tmp_path
):
    """A remove of a previously DV-masked file must (a) carry the
    file's prior deletionVector descriptor in the mirrored log —
    real Delta removes copy the add's descriptor — and (b) have CDF
    derivation report only the file's LIVE rows as deleted (the
    masked rows were already reported by the DV commit)."""
    t = versioned_table(spark, str(tmp_path / "dvow"), use_delta=False,
                        cdf=True)
    t.write(_df(spark, [(i, f"v{i}") for i in range(10)]),
            timestamp="2026-01-01T00:00:00")
    # merge-on-read DELETE: cdf records cdc, the file gains a DV
    n = t.delete_where(F.col("id") < 4, timestamp="2026-01-02T00:00:00",
                       use_dv=True)
    assert n == 4
    t.write(_df(spark, [(100, "new")]), mode="overwrite",
            timestamp="2026-01-03T00:00:00")
    # the mirrored remove carries the descriptor
    removes = [
        a["remove"]
        for acts in _group_actions(spark, t.path).values()
        for a in acts
        if a.get("remove") is not None
    ]
    assert any(r.get("deletionVector") for r in removes)
    got = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(spark, t.path, 1, 2).collect()
    )
    assert got == [
        *((i, "delete", 2) for i in range(4, 10)),
        (100, "insert", 2),
    ]
    # full-feed sanity: every row deleted exactly once across v1+v2
    full = DL.read_delta_cdf(spark, t.path, 0)
    dels = sorted(
        r.id for r in full.filter(
            F.col("_change_type") == "delete"
        ).collect()
    )
    assert dels == list(range(10))


def test_cdf_timestamp_bounds_and_history(spark, tmp_path):
    """read_delta_cdf timestamp bounds (delta-spark's readChangeFeed
    startingTimestamp/endingTimestamp, resolved by the spec clock)
    and delta_history (DESCRIBE HISTORY through the log alone) —
    both on an ICT table so times are the table's own recorded
    clock, deterministic."""
    t = versioned_table(spark, str(tmp_path / "tsb"), use_delta=False,
                        cdf=True, ict=True)
    t.write(_df(spark, [(1, "a")]), timestamp="2026-01-01T00:00:00")
    t.write(_df(spark, [(2, "b")]), mode="append",
            timestamp="2026-02-01T00:00:00")
    t.delete_where(F.col("id") == 1, timestamp="2026-03-01T00:00:00",
                   use_dv=True)
    got = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(
            spark, t.path, starting_timestamp="2026-01-15T00:00:00"
        ).collect()
    )
    assert got == [(1, "delete", 2), (2, "insert", 1)]
    mid = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(
            spark, t.path,
            starting_timestamp="2026-01-15T00:00:00",
            ending_timestamp="2026-02-15T00:00:00",
        ).collect()
    )
    assert mid == [(2, "insert", 1)]
    with pytest.raises(ValueError, match="after the last commit"):
        DL.read_delta_cdf(
            spark, t.path, starting_timestamp="2030-01-01T00:00:00"
        )
    with pytest.raises(ValueError, match="not both"):
        DL.read_delta_cdf(
            spark, t.path, from_version=0,
            starting_timestamp="2026-01-01T00:00:00",
        )
    # omitted bounds = the full feed
    assert DL.read_delta_cdf(spark, t.path).count() == 3

    hist = DL.delta_history(spark, t.path).collect()
    assert [r.version for r in hist] == [2, 1, 0]
    assert hist[2].operation == "APPEND"
    assert hist[0].operation == "DELETE"
    assert hist[0].num_added_files == 1  # DV re-add
    assert hist[0].num_removed_files == 1
    assert hist[2].timestamp == DL._iso_to_millis("2026-01-01T00:00:00")
    assert all("versioned-table mirror" in r.engineInfo for r in hist)


def test_spec_and_custom_cdf_agree_on_full_script(spark, tmp_path):
    """Two independent CDF implementations — the custom log's
    table_changes (derives/serves from VersionedTable state) and the
    spec read_delta_cdf (reconstructs from _delta_log cdc actions +
    derivation) — must produce the SAME feed over one script
    covering append, copy-on-write delete, merge-on-read update, and
    a plain overwrite (custom versions are 1-based, the spec log
    0-based)."""
    t = versioned_table(spark, str(tmp_path / "agree"), use_delta=False,
                        cdf=True)
    t.write(_df(spark, [(i, f"v{i}") for i in range(8)]),
            timestamp="2026-01-01T00:00:00")
    t.write(_df(spark, [(100, "x")]), mode="append",
            timestamp="2026-01-02T00:00:00")
    t.delete_where(F.col("id") < 2, timestamp="2026-01-03T00:00:00")
    t.update_where(F.col("id") == 5, {"val": F.lit("FIVE")},
                   timestamp="2026-01-04T00:00:00", use_dv=True)
    t.write(_df(spark, [(200, "y")]), mode="overwrite",
            timestamp="2026-01-05T00:00:00")
    custom = sorted(
        (r.id, r.val, r._change_type, r._commit_version - 1)
        for r in t.table_changes(0).collect()
    )
    spec = sorted(
        (r.id, r.val, r._change_type, r._commit_version)
        for r in DL.read_delta_cdf(spark, t.path).collect()
    )
    assert custom == spec
