"""Deletion-vector masking at scale (round 12): above
``_DV_BROADCAST_MAX`` total masked positions the batch read paths
must decode bitmaps INSIDE executors (Arrow-batched pandas_udf over
(file, row_index) only) — never materialize O(deleted rows) Python
structures on the driver. Below the threshold the all-JVM broadcast
anti-join fast path must remain (whole-stage codegen, no Python in
the scan). The reference applies DVs inside the scan too (delta-rs
via main.py:314's ``DeltaTable.to_pandas``); round-11's driver-side
decode was the one structural scale-killer VERDICT flagged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.versioned import versioned_table
from etl_deltalake_spark.plans.inspect import plan_string

N = 1_200_000  # > _DV_BROADCAST_MAX once 7/8 of it is masked


@pytest.fixture(scope="module")
def big(spark, tmp_path_factory):
    """One 1.2M-row DV table shared by the module: DELETE masks
    1.05M rows (7/8) in one commit — past the broadcast threshold,
    so every read below must take the executor-decode path."""
    path = str(tmp_path_factory.mktemp("dvscale") / "t")
    t = versioned_table(spark, path, use_delta=False)
    df = spark.range(N).select(
        F.col("id").cast("long"),
        (F.col("id") % 7).cast("long").alias("k"),
    )
    t.write(df, mode="overwrite", timestamp="2024-01-01T00:00:00")
    n = t.delete_where(
        F.col("id") % 8 != 0, timestamp="2024-01-02T00:00:00", use_dv=True
    )
    assert n == N - N // 8
    return t


def test_large_mask_read_decodes_in_workers(spark, big):
    out = big.read()
    plan = plan_string(out)
    # the scale path: bitmap decode behind an Arrow-batched python
    # predicate, applied inside the scan stage — and NOT the
    # broadcast join that would require driver-side positions
    assert "ArrowEvalPython" in plan
    assert "BroadcastHashJoin" not in plan
    assert out.count() == N // 8
    # exact content: survivors are the multiples of 8
    got = out.agg(
        F.sum("id").alias("s"), F.max("id").alias("m")
    ).collect()[0]
    k = N // 8
    assert got["s"] == 8 * (k - 1) * k // 2
    assert got["m"] == N - 8


def test_repeat_delete_unions_masks_in_workers(spark, big):
    # second DV delete on already-masked files: the old 1.05M-row
    # mask must be decoded and unioned in the WORKER kernel, not on
    # the driver
    n2 = big.delete_where(
        (F.col("id") % 8 == 0) & (F.col("id") < 400_000),
        timestamp="2024-01-03T00:00:00",
        use_dv=True,
    )
    assert n2 == 400_000 // 8
    assert big.read().count() == N // 8 - 400_000 // 8
    # time travel still sees the pre-delete snapshots (versions are
    # 1-based: v1 = initial write, v2 = first DV delete)
    assert big.read(version=2).count() == N // 8
    assert big.read(version=1).count() == N


def test_large_mask_cdf_no_driver_positions(spark, big):
    # CDF over the big DELETE commit: the (new ∧ ¬old) predicate
    # must evaluate executor-side
    ch = big.table_changes(1, 2)
    dels = ch.filter(F.col("_change_type") == "delete")
    assert "ArrowEvalPython" in plan_string(dels)
    assert dels.count() == N - N // 8


def test_small_mask_keeps_jvm_broadcast_path(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "small"), use_delta=False)
    t.write(
        spark.range(10_000).select(F.col("id").cast("long")),
        mode="overwrite",
        timestamp="2024-01-01T00:00:00",
    )
    t.delete_where(
        F.col("id") % 100 == 3, timestamp="2024-01-02T00:00:00", use_dv=True
    )
    out = t.read()
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan
    assert out.count() == 9_900


def test_threshold_flip_is_the_only_difference(spark, tmp_path, monkeypatch):
    # same table, both paths, bit-identical results
    t = versioned_table(spark, str(tmp_path / "flip"), use_delta=False)
    t.write(
        spark.range(5_000).select(
            F.col("id").cast("long"),
            (F.col("id") % 3).cast("long").alias("k"),
        ),
        mode="overwrite",
        timestamp="2024-01-01T00:00:00",
    )
    t.delete_where(
        F.col("id") % 5 == 0, timestamp="2024-01-02T00:00:00", use_dv=True
    )
    fast = sorted(map(tuple, t.read().collect()))
    monkeypatch.setattr(DL, "_DV_BROADCAST_MAX", 0)
    slow_df = t.read()
    assert "ArrowEvalPython" in plan_string(slow_df)
    assert sorted(map(tuple, slow_df.collect())) == fast


def test_dv_update_race_cleanup_preserves_partitioned_data(spark, tmp_path):
    """ADVICE r11 (high): losing a commit race mid merge-on-read
    UPDATE on a PARTITIONED table must clean up only the files it
    just wrote — partition dirs are shared across commits, so the
    old recursive dirname delete destroyed other commits' live data
    files."""
    import json

    from etl_deltalake_spark.sources.versioned import _write_file_atomic

    t = versioned_table(spark, str(tmp_path / "p"), use_delta=False)
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(300)], "id long, p long, v double"
    )
    t.write(
        df, mode="overwrite", partition_by=["p"],
        timestamp="2024-01-01T00:00:00",
    )
    # squat the next log slot, as a racing writer would
    squatted = json.dumps(
        {
            "version": 2,
            "operation": "append",
            "add": [],
            "remove": [],
            "schema": [["id", "long"], ["p", "long"], ["v", "double"]],
            "timestamp": "2024-01-02T00:00:00",
            "partition_by": ["p"],
        }
    ).encode()
    assert _write_file_atomic(spark, t._log_path(2), squatted)
    n = t.update_where(
        F.col("id") % 10 == 0,
        {"v": F.lit(-1.0)},
        timestamp="2024-01-03T00:00:00",
        use_dv=True,
    )
    assert n == 30
    out = t.read()
    assert out.count() == 300
    assert out.filter(F.col("v") == -1.0).count() == 30
    assert out.agg(F.sum("id")).collect()[0][0] == 299 * 300 // 2
    # pre-update snapshot intact: the loser's cleanup touched no
    # committed files
    assert t.read(version=1).count() == 300
    assert t.read(version=1).filter(F.col("v") < 0).count() == 0


def test_vacuum_walks_multi_column_partitions(spark, tmp_path):
    """ADVICE r11 (medium): vacuum assumed a two-level data/ layout;
    two partition columns nest data/a=?/b=?/part-* one deeper, where
    the old walk crashed on fs.delete(dir, recursive=False)."""
    t = versioned_table(spark, str(tmp_path / "mp"), use_delta=False)
    df = spark.createDataFrame(
        [(i, i % 2, i % 3, float(i)) for i in range(60)],
        "id long, a long, b long, v double",
    )
    t.write(
        df, mode="overwrite", partition_by=["a", "b"],
        timestamp="2024-01-01T00:00:00",
    )
    t.write(
        df.withColumn("v", F.col("v") + 1000.0),
        mode="overwrite",
        timestamp="2024-01-02T00:00:00",
    )
    deleted = t.vacuum(retain_versions=1)
    assert deleted > 0
    assert t.read().count() == 60
    assert t.read().agg(F.min("v")).collect()[0][0] == 1000.0


class _CondPutStore:
    """Mock object-store log store: a shared dict provides the
    put-if-absent mutual exclusion (what DynamoDB provides for real
    S3 deployments); the payload still lands on the local FS so
    readers replay it. Records every attempt for the contract
    assertions."""

    def __init__(self, spark):
        self.spark = spark
        self.claimed: dict = {}
        self.attempts: list = []

    def __call__(self, path: str, payload: bytes) -> bool:
        won = path not in self.claimed
        self.attempts.append((path, won))
        if not won:
            return False
        self.claimed[path] = payload
        from etl_deltalake_spark.sources.versioned import _write_file_atomic

        assert _write_file_atomic(self.spark, path, payload)
        return True


def test_log_store_seam_mediates_commit_races(spark, tmp_path):
    """Round 12 (VERDICT #7): commit placement goes through the
    injectable put-if-absent seam, so multi-writer safety on stores
    without atomic rename (S3) is a deployment choice, not
    scheme-implicit. Two writers share one conditional-put store:
    both race for the same version slot, exactly one wins it, the
    loser retries against the refreshed tip and lands next."""
    path = str(tmp_path / "s3ish")
    store = _CondPutStore(spark)
    a = versioned_table(spark, path, use_delta=False, log_store=store)
    b = versioned_table(spark, path, use_delta=False, log_store=store)
    a.write(
        spark.createDataFrame([(1, "a")], "id long, val string"),
        timestamp="2024-01-01T00:00:00",
    )
    # b's handle replays the log lazily, so both writers now contend
    # for version 2: claim it in the store WITHOUT a file landing —
    # exactly the crashed-writer / remote-claim window rename cannot
    # see — then b must lose at the seam, not at the FS
    v2 = a._log_path(2)
    store.claimed[v2] = b"remote-claim"
    with pytest.raises(RuntimeError, match="contended"):
        b.write(
            spark.createDataFrame([(2, "b")], "id long, val string"),
            timestamp="2024-01-02T00:00:00",
            max_retries=2,
        )
    # both of b's attempts lost AT THE SEAM (no v2 file exists on
    # disk for rename to refuse — only the store knew)
    assert [won for p, won in store.attempts if p == v2] == [False, False]
    # release the phantom claim by letting the real v2 land, then the
    # loser retries through: sees v2, commits v3
    del store.claimed[v2]
    a.write(
        spark.createDataFrame([(5, "e")], "id long, val string"),
        timestamp="2024-01-03T00:00:00",
    )
    v = b.write(
        spark.createDataFrame([(2, "b")], "id long, val string"),
        timestamp="2024-01-04T00:00:00",
    )
    assert v == 3
    assert sorted((r.id, r.val) for r in b.read().collect()) == [
        (1, "a"), (2, "b"), (5, "e"),
    ]
    # every commit file that exists was placed through the store
    assert set(store.claimed) == {a._log_path(i) for i in (1, 2, 3)}


def test_dv_dml_lost_race_retries_through_log_store(spark, tmp_path):
    """ADVICE r12 (high): losing a commit race during merge-on-read
    DML crashed with 'too many values to unpack' (the conflict check
    iterated `for rel, _ in touched:` after touched became a list of
    path strings). The loser must instead re-check the snapshot and
    retry — succeeding when the rival commit was a benign append
    that touched none of the masked files."""
    path = str(tmp_path / "dvrace")
    holder: dict = {}

    class _LoseOnce:
        def __init__(self):
            self.fired = False

        def __call__(self, p: str, payload: bytes) -> bool:
            from etl_deltalake_spark.sources.versioned import (
                _write_file_atomic,
            )

            if not self.fired and p == holder.get("slot"):
                # a rival writer lands THIS slot first (benign
                # append), then the seam reports the loss
                self.fired = True
                holder["rival"]()
                return False
            return _write_file_atomic(spark, p, payload)

    store = _LoseOnce()
    t = versioned_table(spark, path, use_delta=False, log_store=store)
    t.write(
        spark.range(200).select(F.col("id").cast("long")),
        mode="overwrite",
        timestamp="2024-01-01T00:00:00",
    )
    rival = versioned_table(spark, path, use_delta=False)
    holder["slot"] = t._log_path(2)
    holder["rival"] = lambda: rival.write(
        spark.createDataFrame([(1001,)], "id long"),
        timestamp="2024-01-02T00:00:00",
    )
    n = t.delete_where(
        F.col("id") % 2 == 0, timestamp="2024-01-03T00:00:00",
        use_dv=True,
    )
    assert store.fired
    assert n == 100
    # the DML landed at version 3, after the rival's append at 2
    out = t.read()
    assert out.count() == 101  # 100 odd survivors + the rival's row
    assert out.filter(F.col("id") == 1001).count() == 1
    assert out.filter((F.col("id") % 2 == 0) & (F.col("id") < 1000)).count() == 0


def test_purge_materializes_masks_rewriting_only_masked_files(
    spark, tmp_path
):
    """REORG ... APPLY (PURGE) (round 13): only the DV-carrying
    files rewrite; untouched files keep their identity; the commit
    is dataChange=false so CDF sees nothing; reads stay bit-equal
    and time travel still serves the pre-purge masks."""
    t = versioned_table(spark, str(tmp_path / "pg"), use_delta=False)
    for i in range(3):  # three single-file appends, 100 rows each
        t.write(
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").cast("long"))
            .coalesce(1),
            mode="overwrite" if i == 0 else "append",
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    assert t.purge(timestamp="2026-01-04T00:00:00") == 0  # no masks
    # mask rows in files 0 and 1 only; file 2 untouched
    n = t.delete_where(
        (F.col("id") < 150) & (F.col("id") % 10 == 0),
        timestamp="2026-01-05T00:00:00",
        use_dv=True,
    )
    assert n == 15
    before = sorted(r.id for r in t.read().collect())
    _f, dvs, _l = t._snapshot_state()
    assert len(dvs) == 2
    untouched = {
        f for f in _f if f[len(t.path) + 1 :] not in dvs
    }
    assert t.purge(timestamp="2026-01-06T00:00:00") == 2
    _f2, dvs2, _l2 = t._snapshot_state()
    assert dvs2 == {}  # masks materialized
    assert untouched <= set(_f2)  # the unmasked file kept its identity
    assert sorted(r.id for r in t.read().collect()) == before
    # mirrored commit: dataChange=false everywhere, removes carry the
    # old descriptors, and the spec reader agrees with the custom one
    acts = [
        a
        for v, a in DL.delta_log_actions(spark, t.path)
        if v == 4  # delta version of the purge (custom v5)
    ]
    adds = [a["add"] for a in acts if a.get("add")]
    rems = [a["remove"] for a in acts if a.get("remove")]
    assert adds and rems
    assert all(a["dataChange"] is False for a in adds)
    assert all(r["dataChange"] is False for r in rems)
    assert all(r.get("deletionVector") for r in rems)
    assert not any(a.get("deletionVector") for a in adds)
    assert sorted(
        r.id for r in DL.read_delta(spark, t.path).collect()
    ) == before
    # CDF across the purge: zero change rows (dataChange=false)
    assert (
        DL.read_delta_cdf(spark, t.path, 3, 4).count() == 0
    )
    # time travel to the masked snapshot still applies the masks
    assert t.read(version=4).count() == 285
    assert t.read(version=3).count() == 300


def test_purge_on_partitioned_mapped_table(spark, tmp_path):
    """Purge composes with hive partitioning and column mapping:
    rewritten live rows land under PHYSICAL names in the right
    partition dirs, and the result is bit-equal."""
    t = versioned_table(spark, str(tmp_path / "pgm"), use_delta=False)
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(90)],
        "id long, p long, val string",
    )
    t.write(df, mode="overwrite", partition_by=["p"],
            timestamp="2026-01-01T00:00:00")
    t.rename_column("val", "label", "2026-01-02T00:00:00")
    t.delete_where(F.col("id") % 9 == 0, timestamp="2026-01-03T00:00:00",
                   use_dv=True)
    before = sorted(map(tuple, t.read().collect()))
    purged = t.purge(timestamp="2026-01-04T00:00:00")
    assert purged >= 1
    _f, dvs, _l = t._snapshot_state()
    assert dvs == {}
    assert sorted(map(tuple, t.read().collect())) == before
    assert sorted(
        map(tuple, DL.read_delta(spark, t.path).collect())
    ) == before
