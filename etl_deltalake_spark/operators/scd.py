"""Slowly-changing-dimension Type 2 merge: history-preserving
dimension maintenance as one declarative plan.

The reference's MERGE is Type 1 (overwrite-in-place,
``DeltaTable.merge`` reference main.py:465-470 — old attribute values
are lost). A warehouse also needs Type 2: when a tracked attribute
changes, CLOSE the current row (stamp ``valid_to``) and open a new
one, so every historical state stays queryable with
``valid_from <= ts < valid_to`` predicates (Kimball's SCD2).

Implementation is copy-on-write over DataFrames (the same posture as
``sources.versioned.VersionedTable.upsert``): one full-outer join of
the OPEN slice against the update batch on the business key decides,
per key, whether the open row is kept, closed, and/or a new row
opens. Closed history rows pass through untouched. Pair it with
``VersionedTable.write(mode='overwrite')`` for atomic publication.

Scale shape: ONE shuffle on the business key for the join; the
closed-history slice is a pass-through union (no shuffle); change
detection is a null-safe column comparison (codegen, no UDFs). At
100 TB the open slice is dimension-sized (|keys|), far smaller than
the fact tables this engine bucket-joins against it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_TO = "9999-12-31"


def scd2_init(
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str,
) -> DataFrame:
    """First load: every update row opens a current version."""
    return updates.select(
        *key_cols,
        *tracked_cols,
        F.col(effective_col).cast("date").alias("valid_from"),
        F.lit(OPEN_TO).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str,
) -> DataFrame:
    """Merge an update batch into an SCD2 table built by
    ``scd2_init``/previous merges; returns the new full table.

    Per business key:
      changed    close the open row at the update's effective date
                 and open a new row with the update's attributes
      unchanged  keep the open row as-is (no spurious versions)
      new key    open a first row
      absent     keep the open row (dimensions don't delete here)

    Change detection is null-safe (NULL → 'x' counts as a change,
    NULL → NULL does not). ``updates`` must be one row per key —
    enforce upstream with expectations.unique; multi-row batches
    need a pre-collapse to the latest row per key.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    schema_cols = [*key_cols, *tracked_cols, "valid_from", "valid_to", "is_current"]
    closed = current.filter(~F.col("is_current")).select(*schema_cols)
    open_rows = current.filter(F.col("is_current")).select(*schema_cols)

    open_rows = open_rows.withColumn("_in_cur", F.lit(True))
    up = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(effective_col).cast("date").alias("_u_eff"),
        F.lit(True).alias("_in_upd"),
    )
    # SQL MERGE key semantics: NULL keys never match (plain ==), but
    # presence is tracked with explicit markers so a NULL-keyed open
    # row still takes the 'absent → keep' branch instead of being
    # silently dropped, and a NULL-keyed update still opens a row.
    cond = [open_rows[k] == up[f"_u_{k}"] for k in key_cols]
    j = open_rows.join(up, cond, "full")

    has_open = F.coalesce(j["_in_cur"], F.lit(False))
    has_upd = F.coalesce(j["_in_upd"], F.lit(False))
    changed = has_open & has_upd & ~_all_same(j, tracked_cols)

    kept_open = j.filter(has_open & (~has_upd | ~changed)).select(*schema_cols)
    newly_closed = j.filter(changed).select(
        *key_cols,
        *tracked_cols,
        "valid_from",
        F.col("_u_eff").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(has_upd & (~has_open | changed)).select(
        *[F.col(f"_u_{c}").alias(c) for c in key_cols],
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        F.col("_u_eff").alias("valid_from"),
        F.lit(OPEN_TO).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(kept_open).unionByName(newly_closed).unionByName(
        opened
    )


def scd2_snapshot(table: DataFrame, as_of) -> DataFrame:
    """Time-travel read over an SCD2 table: reconstruct the dimension
    exactly as it stood at ``as_of`` (date string or Column) with the
    half-open validity predicate ``valid_from <= as_of < valid_to``.

    This is the query-side payoff of SCD2 (and the portable analogue
    of Delta's ``VERSION AS OF`` — reference main.py:465-470 keeps no
    history at all, so point-in-time reads are impossible there).
    Scale shape: a pure scan-side filter — both bounds push down to
    the parquet scan and prune row groups on valid_from/valid_to
    min/max stats; no shuffle, no join.
    """
    ts = as_of if isinstance(as_of, Column) else F.lit(as_of).cast("date")
    return table.filter(
        (F.col("valid_from") <= ts) & (ts < F.col("valid_to"))
    ).drop("is_current")


def _all_same(j: DataFrame, tracked_cols: Sequence[str]):
    same = F.lit(True)
    for c in tracked_cols:
        same = same & j[c].eqNullSafe(j[f"_u_{c}"])
    return same
