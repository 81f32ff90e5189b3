"""Persistent-table layer: write, append, and MERGE.

Re-expresses the reference's storage operators (SURVEY §2.1):
 - S5 ``guardar_data_delta`` (reference main.py:391-426): mode
   overwrite/append with optional partition columns.
 - S6 ``guardar_nueva_data`` (reference main.py:429-475): insert-only
   MERGE — ``when_not_matched_insert_all`` keyed on a join predicate;
   existing keys are left untouched (idempotent append/dedup, NOT a
   full upsert). The reference's partitioned branch silently degrades
   to a blind append (main.py:455-462); we do NOT copy that quirk —
   merge semantics are identical with or without partitioning here.

When the ``delta-spark`` package is present the Delta path is used
(ACID MERGE, schema enforcement); otherwise a Parquet implementation
provides the same logical semantics: new-keys-only anti-join +
append. At 100 TB the anti-join is a shuffle on the merge key —
partition both sides on that key (``partition_cols``) so repeated
merges stay co-located, and rely on AQE to handle skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def table_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-agnostic existence check through the Hadoop FS API.

    ``os.path.exists`` only sees the driver's local filesystem — on
    ``s3://``/``abfss://``/``hdfs://`` it is always False, which would
    silently turn every incremental run into a "first run" overwrite.
    The Hadoop FileSystem resolves whatever scheme the path carries.
    """
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hadoop_path))


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: Sequence[str] | None = None,
    merge_schema: bool = False,
) -> None:
    """S5: persist a DataFrame as a (Delta|Parquet) table.

    Unlike the reference, invalid args raise instead of print-and-
    return-None (SURVEY §2.7 error model).

    Appends enforce the existing column set: a parquet append
    SILENTLY accepts any schema (the mismatch only surfaces — or
    worse, doesn't — at read time), so the Delta-style write-time
    check is re-created here. ``merge_schema=True`` permits a
    superset schema (new nullable columns); readers then need
    ``read_table(..., merge_schema=True)`` on the parquet path, while
    Delta handles it transactionally via its own ``mergeSchema``.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    fmt = "delta" if _delta_available() else "parquet"
    if mode == "append" and table_exists(df.sparkSession, path):
        existing_types = dict(read_table(df.sparkSession, path).dtypes)
        incoming_types = dict(df.dtypes)
        existing = set(existing_types)
        incoming = set(incoming_types)
        if incoming != existing:
            if not merge_schema:
                raise ValueError(
                    f"schema enforcement: append columns {sorted(incoming)} != "
                    f"table columns {sorted(existing)}; pass merge_schema=True "
                    "to evolve (new columns) or overwrite to replace"
                )
            if not incoming >= existing:
                raise ValueError(
                    "schema evolution adds columns only; append is missing "
                    f"existing columns {sorted(existing - incoming)}"
                )
        # Types are enforced even when the name sets agree — a same-name
        # type change lands mixed-type parquet files that only fail (or
        # silently misread) at scan time. Delta enforces this at write
        # time; so do we.
        retyped = {
            c: (existing_types[c], incoming_types[c])
            for c in incoming & existing
            if incoming_types[c] != existing_types[c]
        }
        if retyped:
            raise ValueError(
                "schema enforcement: append changes column types "
                f"{retyped} (table_type, append_type); cast the frame or "
                "overwrite to change types"
            )
    writer = df.write.format(fmt).mode(mode)
    if merge_schema and fmt == "delta":
        writer = writer.option("mergeSchema", "true")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_table(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """S4: lazy scan of a persisted table. ``merge_schema=True``
    reconciles per-file schemas after evolution (parquet pays a
    footer scan per file for it, so it stays opt-in; Delta reads its
    unified schema from the log for free)."""
    fmt = "delta" if _delta_available() else "parquet"
    reader = spark.read.format(fmt)
    if merge_schema and fmt == "parquet":
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)


def merge_insert_if_absent(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] | None = None,
) -> None:
    """S6: insert source rows whose key is absent from the target.

    Delta path: ``DeltaTable.merge(...).whenNotMatchedInsertAll()``
    (the reference's predicate string ``source.id = target.id``,
    main.py:603, generalizes to ``key_cols``). Parquet path:
    left-anti join then append — same rows land, without Delta's
    transactional conflict detection.
    """
    if _delta_available():
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(spark, path)
        predicate = " AND ".join(f"target.{c} = source.{c}" for c in key_cols)
        (
            target.alias("target")
            .merge(source.alias("source"), predicate)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    existing = read_table(spark, path).select(*key_cols)
    new_rows = source.join(existing, on=list(key_cols), how="left_anti")
    # Materialize before appending: the anti-join plan reads the
    # target path that the append below mutates.
    new_rows = new_rows.localCheckpoint(eager=True)
    write_table(new_rows, path, mode="append", partition_cols=partition_cols)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: Sequence[str] | None = None,
) -> int:
    """OPTIMIZE-style small-file compaction (maintenance op the
    reference's Delta storage would get from ``OPTIMIZE``; the
    parquet fallback provides the same layout effect).

    Many small files are the natural residue of incremental appends
    (each micro-batch/poll writes its own files); at scale they
    dominate scan open/footer costs. Delta path: transactional
    ``optimize().executeCompaction()``. Parquet path: rewrite at
    ~``target_file_bytes`` per file into a side directory, then swap
    via Hadoop FS rename — the data never materializes on the driver
    and the source files stay readable until the swap. The swap is
    delete+rename (NOT atomic): single-writer maintenance windows
    only; the Delta branch is the concurrent-safe form.

    Returns the file count written.
    """
    if _delta_available():
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return -1

    import math

    jvm = spark._jvm
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(src).getLength()
    n_files = max(1, math.ceil(size / target_file_bytes))

    tmp = path.rstrip("/") + "__compacting"
    df = read_table(spark, path).repartition(n_files)
    write_table(df, tmp, mode="overwrite", partition_cols=partition_cols)

    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(src, True)
    fs.rename(tmp_path, src)
    return n_files


def merge_upsert(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: Sequence[str],
    partition_cols: Sequence[str] | None = None,
) -> None:
    """Full upsert: update matched keys, insert unmatched.

    The reference never ships this (its MERGE is insert-only); it is
    table stakes for an engine, so provided here. Parquet fallback:
    keep target rows whose key is absent from source, union source,
    overwrite.
    """
    if _delta_available():
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(spark, path)
        predicate = " AND ".join(f"target.{c} = source.{c}" for c in key_cols)
        (
            target.alias("target")
            .merge(source.alias("source"), predicate)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    target_df = read_table(spark, path)
    kept = target_df.join(source.select(*key_cols), on=list(key_cols), how="left_anti")
    merged = kept.unionByName(source.select(*target_df.columns)).localCheckpoint(eager=True)
    write_table(merged, path, mode="overwrite", partition_cols=partition_cols)
