"""Table reconciliation: keyed diff of two relations and a one-pass
column profile — the observability half of the quality toolkit
(operators/expectations.py is the gating half).

``table_diff`` answers "what changed between these two snapshots?"
(e.g. two VersionedTable versions, or source vs migrated copy):
per-key classification into added / removed / changed / unchanged,
computed with ONE full-outer key-shuffle join and null-safe column
comparison — the same join shape as scd.scd2_merge, because a diff
IS an SCD2 change detection without the history write.

``profile_columns`` answers "what does this table look like?":
null count, distinct count (exact), min/max per column, all compiled
into a single aggregation pass over one scan (distinct counts make it
one shuffle); the report is #columns rows. At 100 TB swap the exact
``count_distinct`` for ``approx_count_distinct`` via ``approx=True``
— same report shape, sketch-merge instead of key shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff: one row per key present in either side, classified

      added      key only in ``right``
      removed    key only in ``left``
      changed    key in both, any compared column differs (null-safe)
      unchanged  key in both, all compared columns equal

    ``compare_cols`` defaults to every shared non-key column. Output
    is (key_cols..., diff) — project/join back for full rows; keeping
    the diff table narrow means only keys + compared values shuffle.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    # Side presence is tracked with explicit marker columns — testing
    # the key columns for NULL would misclassify legitimately
    # NULL-keyed rows (eqNullSafe matches them across sides) as
    # 'added' regardless of where they live.
    a = left.select(
        *key_cols,
        *[F.col(c).alias(f"_l_{c}") for c in compare_cols],
        F.lit(True).alias("_in_l"),
    )
    b = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(True).alias("_in_r"),
    )
    cond = [a[k].eqNullSafe(b[f"_rk_{k}"]) for k in key_cols]
    j = a.join(b, cond, "full")

    in_left = F.coalesce(F.col("_in_l"), F.lit(False))
    in_right = F.coalesce(F.col("_in_r"), F.lit(False))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
    diff = (
        F.when(~in_left, F.lit("added"))
        .when(~in_right, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    keys = [
        F.coalesce(a[k], b[f"_rk_{k}"]).alias(k) for k in key_cols
    ]
    return j.select(*keys, diff.alias("diff"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(diff, n) counts over ``table_diff`` — the four-row report a
    migration check reads."""
    return (
        table_diff(left, right, key_cols, compare_cols)
        .groupBy("diff")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def table_checksum(
    df: DataFrame, cols: Sequence[str] | None = None
) -> DataFrame:
    """Order-insensitive table fingerprint: (n_rows, checksum) where
    checksum = Σ over rows of the first-48-bits of
    md5(field-separated row rendering), as exact decimal. Because the
    reduction is a commutative SUM of a per-row pure function, the
    fingerprint is independent of row order, partitioning, and engine
    — the cheap cross-system equality check you run before and after
    a migration when a full ``table_diff`` (a key-shuffle join) is
    too expensive. Two tables differing in any cell collide with
    probability ~2⁻⁴⁸ per differing row-pair.

    Row rendering: each column cast to string with an explicit
    ``coalesce(…, '<null>')`` (``concat_ws`` silently DROPS nulls,
    which would make (NULL,'x') collide with ('x',NULL)), joined on
    0x1f. Cast-to-string is engine-portable for ints/strings/dates;
    for floats/timestamps pass pre-formatted columns.

    Scale: map-side partial sums; the shuffle carries one
    (count, decimal) pair per partition. No keys, no join.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    rendered = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols],
    )
    row_sig = F.conv(F.substring(F.md5(rendered), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_sig).alias("checksum"),
    )


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False
) -> DataFrame:
    """Per-column profile: (col_name, n_null, n_distinct, min_str,
    max_str) — min/max rendered as strings so one report covers mixed
    types. Every statistic for every column is computed in a SINGLE
    aggregation (one scan; the exact distincts expand internally, or
    HLL sketches when ``approx=True``); the stack() pivot to rows is
    over the 1-row aggregate, driver-free.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in set(df.columns)]
    if missing:
        raise ValueError(f"unknown columns {missing}")
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count_if(F.col(c).isNull()).cast("bigint").alias(f"_null_{c}"),
            nd(c).cast("bigint").alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `_null_{c}`, `_nd_{c}`, `_min_{c}`, `_max_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(col_name, n_null, n_distinct, min_str, max_str)"
        )
    )


def golden_record(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Survivorship merge (the MDM "golden record"): per key, each
    attribute independently takes its value from the LATEST row
    where that attribute is non-null — a newer row with a null phone
    must not erase the older known phone, which is exactly what
    keep-latest-row dedup (relational.merge_dedup) gets wrong for
    sparse updates.

    ``order_col`` must be a totally-ordering scalar (e.g. an event
    sequence number, or epoch·shift + id for timestamp+tiebreak) —
    per-attribute recency is ``max_by(col, order WHERE col IS NOT
    NULL)``, the null-ordering-key-ignoring contract shared by Spark
    ``max_by`` and DuckDB ``arg_max``. Output adds ``last_seen`` =
    max order key per entity.

    Scale: ONE groupBy carrying (key, order, values) — no window, no
    join; map-side combine keeps shuffle state at O(#keys).
    """
    aggs = [
        F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), F.col(order_col))
        ).alias(c)
        for c in value_cols
    ]
    aggs.append(F.max(F.col(order_col)).alias("last_seen"))
    return df.groupBy(*key_cols).agg(*aggs)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a change-data-capture batch (op ∈ I/U/D per row) to a
    snapshot — the copy-on-write CDC merge: deletes remove the key,
    inserts/updates replace it, untouched rows pass through. This is
    the delete-handling MERGE the Type-1 upsert
    (sources/table_format.py, reference main.py:465-470) lacks.

    With ``seq_col`` the batch may carry several changes per key;
    the LATEST (max seq, ties impossible with a proper sequence)
    wins — a delete followed by a re-insert in one batch nets to the
    re-inserted row, matching log-replay semantics.

    Scale: one row_number collapse on the change batch (batch-sized,
    not snapshot-sized) and ONE key anti-join against the snapshot —
    the snapshot never shuffles more than its key columns; change
    batches are broadcast when small.
    """
    ops = changes
    if seq_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        ops = (
            ops.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # fail loudly on unknown ops — silently dropping them would
    # desync the snapshot from the log
    ops = ops.withColumn(
        op_col,
        F.when(
            F.col(op_col).isin("I", "U", "D"), F.col(op_col)
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("apply_cdc: unknown op "), F.col(op_col))
            )
        ),
    )
    touched = ops.select(*key_cols)
    survivors = base.join(touched, list(key_cols), "left_anti")
    upserts = ops.filter(F.col(op_col) != "D").select(*base.columns)
    return survivors.unionByName(upserts)


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-level drift report between two table snapshots
    (round 5) — the structural companion of this module's row-level
    ``table_diff``: one row per column naming its disposition
    (added / removed / type_changed / unchanged) with both type
    renders. Purely metadata-driven (reads the schemas, never the
    data), so it is free to run before every incremental load as the
    guard that decides mergeSchema vs fail vs quarantine.

    Output: column, status, old_type, new_type — built with
    createDataFrame from the driver-side schema objects (metadata,
    not data), ordered by column name.
    """
    spark = old.sparkSession
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "type_changed", o[c], n[c]))
        else:
            rows.append((c, "unchanged", o[c], n[c]))
    return spark.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )


def resolve_entities(
    recs: DataFrame,
    id_col: str,
    name_col: str,
    block_key,
    order_col: str,
    value_cols: Sequence[str],
    max_dist: int = 2,
) -> DataFrame:
    """End-to-end entity resolution (round 8) — the MDM composition
    the individual pieces exist for: BLOCK (equi-join on a cheap
    deterministic key — no cartesian product; candidates only form
    within a block) → VERIFY (Levenshtein ≤ ``max_dist`` on the name
    inside each block — the fuzzy gate that rejects same-block
    impostors) → CLUSTER (min-label propagation over the verified
    pair graph; unmatched records stay singletons via the coalesce) →
    SURVIVE (``golden_record`` per cluster: each attribute from its
    latest non-null carrier, plus ``n_recs``).

    Scale: the only joins are the blocked candidate equi-join
    (shuffle on block key; block sizes bound the quadratic term), the
    propagation rounds (edge-list sized), and the cluster-label
    attach; survivorship is one groupBy. No all-pairs anywhere.

    Reference parity: composes SURVEY §2.9 fuzzy-matching, §2.8
    iterative clustering, and the golden-record survivorship the
    reference's keep-latest dedup (main.py:365-377) approximates.
    """
    from etl_deltalake_spark.operators.dedup import (
        label_propagation_clusters,
    )

    keyed = recs.withColumn("_bk", block_key)
    a = keyed.select(
        F.col(id_col).alias("_id_a"), F.col(name_col).alias("_nm_a"), "_bk"
    )
    b = keyed.select(
        F.col(id_col).alias("_id_b"), F.col(name_col).alias("_nm_b"), "_bk"
    )
    pairs = (
        a.join(b, "_bk")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(F.levenshtein("_nm_a", "_nm_b") <= max_dist)
        .select("_id_a", "_id_b")
    )
    labels = label_propagation_clusters(pairs, "_id_a", "_id_b")
    clustered = recs.join(
        labels.withColumnRenamed("doc", id_col), id_col, "left"
    ).withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
    golden = golden_record(clustered, ["cluster"], order_col, list(value_cols))
    sizes = clustered.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_recs")
    )
    return golden.join(sizes, "cluster")
