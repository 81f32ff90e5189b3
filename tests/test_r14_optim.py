"""Round-14 optimization internals: the local-FS metadata fast path
must reproduce Hadoop FileSystem semantics exactly, and the streaming
readers' Arrow fast path must emit the same rows as the row path.

(The similarity-kernel bit-exactness is pinned by the pre-existing
test_ivf_assign_df_bitwise_matches_literal_form and the driver
oracle rows; these tests cover the NEW seams only.)
"""

from __future__ import annotations

import os
import tempfile

import pytest


# ---- _LocalFS shim: Hadoop semantics on plain OS calls ---------------


def test_localfs_rename_refuses_to_clobber():
    from etl_deltalake_spark.sources.versioned import _LocalFS, _LPath

    fs = _LocalFS()
    d = tempfile.mkdtemp()
    with open(f"{d}/a", "wb") as f:
        f.write(b"x")
    assert fs.rename(_LPath(f"{d}/a"), _LPath(f"{d}/b")) is True
    with open(f"{d}/a2", "wb") as f:
        f.write(b"y")
    # destination exists -> False, source untouched (the optimistic-
    # concurrency loss signal _write_file_atomic depends on)
    assert fs.rename(_LPath(f"{d}/a2"), _LPath(f"{d}/b")) is False
    assert os.path.exists(f"{d}/a2")
    with open(f"{d}/b", "rb") as f:
        assert f.read() == b"x"
    # missing source -> False; missing dest parent -> False
    assert fs.rename(_LPath(f"{d}/nope"), _LPath(f"{d}/c")) is False
    assert fs.rename(_LPath(f"{d}/a2"), _LPath(f"{d}/no_dir/c")) is False


def test_localfs_liststatus_hides_crc_and_sorts():
    from etl_deltalake_spark.sources.versioned import _LocalFS, _LPath

    fs = _LocalFS()
    d = tempfile.mkdtemp()
    for name in ("b.json", "a.json", ".a.json.crc"):
        with open(f"{d}/{name}", "wb") as f:
            f.write(b"z")
    names = [s.getPath().getName() for s in fs.listStatus(_LPath(d))]
    assert names == ["a.json", "b.json"]  # crc hidden, deterministic order


def test_localfs_delete_sweeps_stale_crc():
    from etl_deltalake_spark.sources.versioned import _LocalFS, _LPath

    fs = _LocalFS()
    d = tempfile.mkdtemp()
    with open(f"{d}/f.json", "wb") as f:
        f.write(b"z")
    with open(f"{d}/.f.json.crc", "wb") as f:
        f.write(b"c")
    assert fs.delete(_LPath(f"{d}/f.json")) is True
    # a stale Hadoop checksum sidecar must not survive the file it
    # checksums — a later Hadoop-path rewrite would fail verification
    assert not os.path.exists(f"{d}/.f.json.crc")
    assert fs.delete(_LPath(f"{d}/f.json")) is False  # already gone


def test_write_file_atomic_local_is_put_if_absent(spark):
    from etl_deltalake_spark.sources.versioned import (
        _read_small_file,
        _write_file_atomic,
    )

    d = tempfile.mkdtemp()
    path = f"{d}/log/00000000000000000001.json"
    assert _write_file_atomic(spark, path, b"first") is True
    assert _write_file_atomic(spark, path, b"second") is False
    assert _read_small_file(spark, path) == b"first"
    # no temp litter left behind
    assert [n for n in os.listdir(f"{d}/log") if n.startswith("_tmp_")] == []


def test_write_file_overwrite_local_advances(spark):
    from etl_deltalake_spark.sources.versioned import (
        _read_small_file,
        _write_file_overwrite,
    )

    d = tempfile.mkdtemp()
    path = f"{d}/_last_checkpoint"
    assert _write_file_overwrite(spark, path, b"v1") is True
    assert _write_file_overwrite(spark, path, b"v2") is True
    assert _read_small_file(spark, path) == b"v2"


def test_local_path_honors_schemes(spark):
    from etl_deltalake_spark.sources.versioned import _local_path

    assert _local_path(spark, "/tmp/x") == "/tmp/x"
    assert _local_path(spark, "file:/tmp/x") == "/tmp/x"
    assert _local_path(spark, "file:///tmp/x") == "/tmp/x"
    assert _local_path(spark, "s3a://bucket/x") is None
    assert _local_path(spark, "hdfs://nn/x") is None


# ---- streaming Arrow fast path: batch == row path --------------------


def test_try_arrow_batch_matches_row_semantics():
    import pyarrow as pa

    from etl_deltalake_spark.sources.delta_stream import _try_arrow_batch

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
        }
    )
    specs = [
        ("id", "bigint", "col", tbl.column("id")),
        ("v", "double", "col", tbl.column("v")),
        ("p", "string", "const", "east"),
        ("extra", "int", "null", None),
        ("_commit_version", "bigint", "const", 7),
    ]
    batch = _try_arrow_batch(specs, 4, {1, 3})  # DV masks rows 1 and 3
    assert batch is not None
    assert batch.schema.names == ["id", "v", "p", "extra", "_commit_version"]
    assert batch.column("id").to_pylist() == [1, 3]  # order preserved
    assert batch.column("p").to_pylist() == ["east", "east"]
    assert batch.column("extra").to_pylist() == [None, None]
    assert batch.column("_commit_version").to_pylist() == [7, 7]


def test_try_arrow_batch_refuses_unknown_types():
    from etl_deltalake_spark.sources.delta_stream import _try_arrow_batch

    # unmapped type -> None so callers take the row path (which
    # handles everything) instead of shipping a wrong Arrow type
    assert _try_arrow_batch([("m", "map<string,string>", "null", None)], 1, None) is None


def test_pa_type_of_matches_spark_worker_schema():
    """The kernel's DDL->Arrow map must equal what Spark's data-source
    worker produces for the row path (to_arrow_schema) — a divergence
    would ship a wrong type straight into the JVM."""
    import pyspark.sql.types as T
    from pyspark.sql.pandas.types import to_arrow_type

    from etl_deltalake_spark.sources.delta_stream import _pa_type_of

    pairs = [
        ("bigint", T.LongType()),
        ("int", T.IntegerType()),
        ("smallint", T.ShortType()),
        ("tinyint", T.ByteType()),
        ("double", T.DoubleType()),
        ("float", T.FloatType()),
        ("string", T.StringType()),
        ("boolean", T.BooleanType()),
        ("binary", T.BinaryType()),
        ("date", T.DateType()),
        ("timestamp", T.TimestampType()),
        ("timestamp_ntz", T.TimestampNTZType()),
        ("decimal(18,2)", T.DecimalType(18, 2)),
    ]
    for ddl, dt in pairs:
        assert _pa_type_of(ddl) == to_arrow_type(dt), ddl


@pytest.mark.usefixtures("spark")
def test_versionedcdf_stream_arrow_path_end_to_end(spark, sf_dir):
    """One real availableNow drain over a table with a DV mask and a
    partition column: the Arrow fast path must produce exactly the
    rows the batch CDF derives."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from etl_deltalake_spark.sources.cdf_source import (
        VersionedCdfDataSource,
    )
    from etl_deltalake_spark.sources.versioned import versioned_table

    spark.dataSource.register(VersionedCdfDataSource)
    root = _tf.mkdtemp(prefix="sgraft_r14arrow_")
    t = versioned_table(spark, f"{root}/t", use_delta=False)
    rows = (
        spark.range(20)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("bucket"),
            (F.col("id") * 10).alias("val"),
        )
        .coalesce(1)  # one data file, so the DV commit re-adds it all
    )
    t.write(rows, timestamp="2026-01-01T00:00:00")
    t.delete_where(
        F.col("k") % 5 == 0, timestamp="2026-01-02T00:00:00", use_dv=True
    )
    got = (
        spark.readStream.format("versionedcdf")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName("r14arrow")
        .trigger(availableNow=True)
        .start()
    )
    got.awaitTermination()
    out = spark.sql(
        "SELECT k, bucket, val, _change_version FROM r14arrow ORDER BY _change_version, k"
    ).collect()
    # v1 streams all 20 adds; v2 (DV DELETE) re-adds the masked file:
    # its live rows stream with the mask applied (no k % 5 == 0 rows)
    v1 = [r for r in out if r["_change_version"] == 1]
    v2 = [r for r in out if r["_change_version"] == 2]
    assert [r["k"] for r in v1] == list(range(20))
    assert [r["k"] for r in v2] == [k for k in range(20) if k % 5 != 0]
    assert all(r["val"] == r["k"] * 10 for r in out)
