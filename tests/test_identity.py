"""IDENTITY columns (round 14, VERDICT r13 #5 — spec
``delta.identity.start/step/allowExplicitInsert/highWaterMark`` plus
the writer-only ``identityColumns`` feature): omitted identity
columns allocate ``watermark + step·(1..n)`` per write, the watermark
advance rides the commit CAS (atomic — raced allocators re-derive
above the winner), GENERATED ALWAYS refuses explicit values while BY
DEFAULT accepts them and jumps the watermark, UPDATE may never SET an
identity column, and MERGE keeps matched rows' values while
allocating for inserts. The spec mirror round-trips the metadata."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.versioned import versioned_table


def _vals(t, col="uid"):
    return sorted(r[col] for r in t.read().select(col).collect())


def test_identity_allocates_start_step_and_advances(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "t"), use_delta=False)
    t.set_identity_column("uid", start=100, step=10)
    t.write(
        spark.createDataFrame([("a",), ("b",), ("c",)], "val string")
        .repartition(2),
        timestamp="2026-01-01T00:00:00",
    )
    assert _vals(t) == [100, 110, 120]
    t.write(
        spark.createDataFrame([("d",), ("e",)], "val string"),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    assert _vals(t) == [100, 110, 120, 130, 140]
    # the spec reader sees identical data and round-trips metadata
    assert sorted(
        r["uid"] for r in DL.read_delta(spark, t.path).collect()
    ) == [100, 110, 120, 130, 140]
    snap = DL.delta_snapshot(spark, t.path)
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(snap["schema_json"])["fields"]
    }
    assert fields["uid"]["delta.identity.start"] == 100
    assert fields["uid"]["delta.identity.step"] == 10
    assert fields["uid"]["delta.identity.allowExplicitInsert"] is False
    assert fields["uid"]["delta.identity.highWaterMark"] == 140
    assert "delta.identity.start" not in fields["val"]
    assert "identityColumns" in snap["protocol"]["writerFeatures"]
    # ALWAYS refuses explicit values; UPDATE refuses SET
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.write(
            spark.createDataFrame([(999, "x")], "uid bigint, val string"),
            mode="append",
            timestamp="2026-01-03T00:00:00",
        )
    with pytest.raises(ValueError, match="identity"):
        t.update_where(
            F.col("val") == "a",
            {"uid": F.lit(5)},
            timestamp="2026-01-03T00:00:00",
        )
    # non-identity updates still work and never touch allocations
    t.update_where(
        F.col("val") == "a",
        {"val": F.lit("A")},
        timestamp="2026-01-04T00:00:00",
        use_dv=True,
    )
    assert _vals(t) == [100, 110, 120, 130, 140]


def test_identity_by_default_accepts_and_jumps_watermark(
    spark, tmp_path
):
    t = versioned_table(spark, str(tmp_path / "d"), use_delta=False)
    t.set_identity_column(
        "uid", start=1, step=1, allow_explicit_insert=True
    )
    t.write(
        spark.createDataFrame([("a",), ("b",)], "val string"),
        timestamp="2026-01-01T00:00:00",
    )
    assert _vals(t) == [1, 2]
    # explicit values accepted; watermark jumps past the max
    t.write(
        spark.createDataFrame(
            [(50, "x"), (7, "y")], "uid bigint, val string"
        ).select("val", "uid"),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    t.write(
        spark.createDataFrame([("z",)], "val string"),
        mode="append",
        timestamp="2026-01-03T00:00:00",
    )
    assert _vals(t) == [1, 2, 7, 50, 51]


def test_identity_sync_seeds_from_existing_data(spark, tmp_path):
    """Attaching identity to a NON-empty table must never allocate at
    or below an existing value (ALTER ... SYNC IDENTITY)."""
    t = versioned_table(spark, str(tmp_path / "s"), use_delta=False)
    t.write(
        spark.createDataFrame(
            [(5, "a"), (42, "b")], "uid bigint, val string"
        ),
        timestamp="2026-01-01T00:00:00",
    )
    t.set_identity_column("uid", start=1, step=1)
    t.write(
        spark.createDataFrame([("c",), ("d",)], "val string"),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    assert _vals(t) == [5, 42, 43, 44]
    # non-bigint columns refuse
    t2 = versioned_table(spark, str(tmp_path / "s2"), use_delta=False)
    t2.write(
        spark.createDataFrame([("a",)], "val string"),
        timestamp="2026-01-01T00:00:00",
    )
    with pytest.raises(ValueError, match="bigint"):
        t2.set_identity_column("val")
    with pytest.raises(ValueError, match="non-zero"):
        t2.set_identity_column("uid", step=0)


def test_identity_raced_append_never_collides(spark, tmp_path):
    """The VERDICT r13 #5 race contract, through the LogStore seam: a
    rival append allocates identity values and wins the slot the
    writer was about to take — the loser must re-derive ABOVE the
    rival's advanced watermark, never reusing its values."""
    path = str(tmp_path / "race")
    holder: dict = {}

    class _LoseOnce:
        def __init__(self):
            self.fired = False

        def __call__(self, p: str, payload: bytes) -> bool:
            from etl_deltalake_spark.sources.versioned import (
                _write_file_atomic,
            )

            if not self.fired and p == holder.get("slot"):
                self.fired = True
                holder["rival"]()
                return False
            return _write_file_atomic(spark, p, payload)

    store = _LoseOnce()
    t = versioned_table(spark, path, use_delta=False, log_store=store)
    t.set_identity_column("uid", start=1, step=1)
    t.write(
        spark.createDataFrame([("a",), ("b",)], "val string"),
        timestamp="2026-01-01T00:00:00",
    )
    rival = versioned_table(spark, path, use_delta=False)
    holder["slot"] = t._log_path(2)
    holder["rival"] = lambda: rival.write(
        spark.createDataFrame([("r1",), ("r2",), ("r3",)], "val string"),
        mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    t.write(
        spark.createDataFrame([("c",), ("d",)], "val string"),
        mode="append",
        timestamp="2026-01-03T00:00:00",
    )
    assert store.fired
    vals = _vals(t)
    assert len(vals) == len(set(vals)), f"identity collision: {vals}"
    assert vals == [1, 2, 3, 4, 5, 6, 7]


def test_identity_merge_keeps_matched_allocates_inserts(
    spark, tmp_path
):
    for name, use_dv in (("m1", True), ("m2", False)):
        t = versioned_table(
            spark, str(tmp_path / name), use_delta=False
        )
        t.set_identity_column("uid", start=1, step=1)
        t.write(
            spark.createDataFrame(
                [("a", 10), ("b", 20)], "k string, x bigint"
            ).coalesce(1),
            timestamp="2026-01-01T00:00:00",
        )
        before = {
            r["k"]: r["uid"] for r in t.read().collect()
        }
        # source omits uid: 'a' is matched (keeps uid), 'z' inserts
        t.upsert(
            spark.createDataFrame(
                [("a", 11), ("z", 30)], "k string, x bigint"
            ),
            ["k"],
            timestamp="2026-01-02T00:00:00",
            use_dv=use_dv,
        )
        after = {
            r["k"]: (r["uid"], r["x"]) for r in t.read().collect()
        }
        assert after["a"] == (before["a"], 11)
        assert after["b"] == (before["b"], 20)
        assert after["z"][0] == 3  # freshly allocated
        # a GENERATED ALWAYS identity column may not ride the source
        with pytest.raises(ValueError, match="omitted"):
            t.upsert(
                spark.createDataFrame(
                    [(9, "q", 1)], "uid bigint, k string, x bigint"
                ),
                ["k"],
                timestamp="2026-01-03T00:00:00",
                use_dv=use_dv,
            )
        # spec reader agrees
        assert sorted(
            map(tuple, DL.read_delta(spark, t.path).collect())
        ) == sorted(map(tuple, t.read().collect()))


def test_identity_watermark_survives_checkpoint_generation(
    spark, tmp_path
):
    """12 single-row appends cross the checkpoint interval — the
    watermark replays correctly and the mirrored metaData still
    carries the live value."""
    t = versioned_table(spark, str(tmp_path / "ck"), use_delta=False)
    t.set_identity_column("uid", start=0, step=2)
    for i in range(12):
        t.write(
            spark.createDataFrame([(f"r{i}",)], "val string"),
            mode="overwrite" if i == 0 else "append",
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    assert _vals(t) == [2 * i for i in range(12)]
    snap = DL.delta_snapshot(spark, t.path)
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(snap["schema_json"])["fields"]
    }
    assert fields["uid"]["delta.identity.highWaterMark"] == 22
    # negative step: a DESCENDING identity
    t2 = versioned_table(spark, str(tmp_path / "neg"), use_delta=False)
    t2.set_identity_column("uid", start=-1, step=-1)
    t2.write(
        spark.createDataFrame([("a",), ("b",), ("c",)], "val string"),
        timestamp="2026-01-01T00:00:00",
    )
    assert _vals(t2) == [-3, -2, -1]
