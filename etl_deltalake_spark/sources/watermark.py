"""Watermark control table: incremental-extraction bookkeeping done
right (SURVEY §2.1 S7–S9).

The reference keeps `{table: {incremental_column, last_value}}` in a
JSON file (metadata_ingestion.json:1-6) written by
``actualizar_utlimo_valor`` (main.py:59-76) — but its reader
(``obtener_ultimo_valor``, main.py:19-38) is dead code, so every
"incremental" run re-extracts everything. Here the watermark is a
one-row-per-table parquet/Delta control table that the incremental
load actually CONSUMES: read watermark → filter source > watermark →
process → commit new watermark. At scale the filter is a pushed-down
predicate on the source scan (parquet min/max stats or Delta data
skipping prune whole files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_deltalake_spark.sources.table_format import (
    read_table,
    table_exists,
    write_table,
)

_SCHEMA_COLS = ("table_name", "incremental_column", "last_value")


def read_watermark(spark: SparkSession, store_path: str, table_name: str):
    """S7 (made live): last committed watermark value for a table, as
    an ISO string, or None on first run. Existence goes through the
    Hadoop FS API so object-store paths behave like local ones."""
    return read_values(spark, store_path, [table_name])[table_name]


def read_values(
    spark: SparkSession, store_path: str, table_names: list[str]
) -> dict:
    """One store read serving several lookups (name → value or None).
    The store is metadata-sized but lives on object storage — callers
    that need both the committed and the pending value (the pipeline
    does, every run) should pay one list/read round, not two."""
    out = {n: None for n in table_names}
    if not table_exists(spark, store_path):
        return out
    rows = (
        read_table(spark, store_path)
        .filter(F.col("table_name").isin(table_names))
        .select("table_name", "last_value")
        .collect()
    )
    for r in rows:
        out[r["table_name"]] = r["last_value"]
    return out


def _overwrite_store(
    spark: SparkSession, store_path: str, merged: DataFrame
) -> None:
    """The store's single write path: checkpoint the new contents off
    the table being replaced, then overwrite. Every mutation
    (commit/pending/clear) funnels through here so a swap to
    transactional Delta MERGE is one edit."""
    write_table(
        merged.localCheckpoint(eager=True), store_path, mode="overwrite"
    )


def _upsert_row(
    spark: SparkSession,
    store_path: str,
    table_name: str,
    incremental_column: str,
    value: str,
) -> None:
    new_row = spark.createDataFrame(
        [(table_name, incremental_column, str(value))], list(_SCHEMA_COLS)
    )
    if table_exists(spark, store_path):
        others = read_table(spark, store_path).filter(
            F.col("table_name") != table_name
        )
        _overwrite_store(spark, store_path, others.unionByName(new_row))
    else:
        write_table(new_row, store_path, mode="overwrite")


def _delete_row(
    spark: SparkSession, store_path: str, table_name: str
) -> None:
    if not table_exists(spark, store_path):
        return
    remaining = read_table(spark, store_path).filter(
        F.col("table_name") != table_name
    )
    _overwrite_store(spark, store_path, remaining)


def commit_watermark(
    spark: SparkSession,
    store_path: str,
    table_name: str,
    incremental_column: str,
    last_value: str,
) -> None:
    """S9: upsert this table's watermark row (read-modify-overwrite;
    the store is tiny — one row per table).

    Monotonic: a commit that would move the watermark BACKWARDS is
    dropped — e.g. a re-poll whose batch was discarded by the
    idempotency guard must not rewind the watermark and re-admit an
    already-ingested window on the next run. Single-writer by design;
    with Delta available this becomes a transactional MERGE.
    """
    prev = read_watermark(spark, store_path, table_name)
    if prev is not None and prev >= str(last_value):
        return
    _upsert_row(spark, store_path, table_name, incremental_column, last_value)


def incremental_load(
    spark: SparkSession,
    source: DataFrame,
    store_path: str,
    table_name: str,
    incremental_column: str,
) -> tuple[DataFrame, str | None]:
    """The reference's intended-but-unwired incremental semantics:
    rows strictly newer than the committed watermark.

    Returns (delta_df, new_watermark). ``delta_df`` is lazy — the
    watermark predicate reaches the scan (parquet row-group stats /
    Delta file pruning make this cheap at 100 TB). Commit the
    returned watermark AFTER the delta has been durably written:
    crash between write and commit re-extracts (at-least-once), and
    an insert-only MERGE downstream makes that idempotent.
    """
    last = read_watermark(spark, store_path, table_name)
    delta = source if last is None else source.filter(
        F.col(incremental_column) > F.lit(last)
    )
    row = delta.select(F.max(incremental_column).alias("m")).collect()[0]
    new_wm = None if row["m"] is None else str(row["m"])
    return delta, new_wm


_PENDING_PREFIX = "_pending_"


def read_pending(spark: SparkSession, store_path: str, table_name: str):
    """Pending-batch watermark written by ``write_pending`` before a
    run's first table write, or None. A surviving pending value whose
    batch never committed is how a crashed run's re-execution learns
    the ORIGINAL batch identity (see pipelines.run_ticker_incremental:
    the batch stamp must be stable across the re-poll, or every
    idempotency guard keyed on it misses and the batch double-
    ingests)."""
    return read_watermark(spark, store_path, _PENDING_PREFIX + table_name)


def read_batch_state(
    spark: SparkSession, store_path: str, table_name: str
) -> tuple[str | None, str | None]:
    """(committed watermark, pending marker) in ONE store read — the
    pair every incremental run needs before deciding its batch
    identity."""
    vals = read_values(
        spark, store_path, [table_name, _PENDING_PREFIX + table_name]
    )
    return vals[table_name], vals[_PENDING_PREFIX + table_name]


def write_pending(
    spark: SparkSession, store_path: str, table_name: str, value: str
) -> None:
    """Phase 1 of the two-phase batch commit: durably record the
    batch identity BEFORE any table write. Overwrites a stale pending
    value (one in-flight batch per table — single-writer, like
    ``commit_watermark``)."""
    _upsert_row(
        spark, store_path, _PENDING_PREFIX + table_name, "pending", value
    )


def clear_pending(
    spark: SparkSession, store_path: str, table_name: str
) -> None:
    """Phase 2 (after ``commit_watermark``): drop the pending marker.
    A crash between commit and clear is benign — the next run sees
    pending <= committed watermark and discards the stale marker."""
    _delete_row(spark, store_path, _PENDING_PREFIX + table_name)
