"""Declarative data-quality expectations: a rule set evaluated in ONE
aggregation pass, returning a small (rule, passed, failing_rows)
report.

The reference's only quality gate is the column-arity guard
(reference main.py:209-210, P1 in SURVEY §2) plus print-and-continue
error handling; this is the engine-level generalization — the
dbt-test / AWS-Deequ surface an ETL needs before promoting a batch
from Bronze to Silver.

Supported rules (each a (name, kind, params) tuple via the builder
functions):

  not_null(col)                    no NULLs in col
  unique(*cols)                    no duplicate (cols) tuples
  accepted_values(col, values)     col ∈ values (NULLs fail too)
  in_range(col, lo, hi)            lo <= col <= hi (NULLs fail)
  row_count_between(lo, hi)        table cardinality bound
  satisfies(name, condition)       arbitrary boolean Column
  references(col, dim, dim_col)    referential integrity: every
                                   non-NULL col value exists in
                                   dim[dim_col] (NULL FKs are not
                                   violations — add not_null(col)
                                   for that)
  functional_dependency(lhs, rhs)  declared FD lhs -> rhs: every lhs
                                   tuple maps to one rhs value (a
                                   null-and-value mix violates);
                                   failing_rows counts rows in
                                   violating groups

Scale shape: every per-row rule compiles to a conditional COUNT in a
single global aggregation — ONE scan, no shuffle beyond the final
partial-agg reduce, no driver-side row access, however many rules are
checked. ``unique`` is the exception (needs a groupBy on the key);
it runs as its own two-stage count-distinct aggregation and joins
into the report, still rows-never-collected. The report itself is
#rules rows.

``enforce(spark_df, rules)`` raises on any failure with the full
report in the message — the write-time gate; ``check`` returns the
report for observability pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, str, dict]


def not_null(col: str) -> Rule:
    return (f"not_null_{col}", "count_if", {"cond": F.col(col).isNull()})


def accepted_values(col: str, values: Sequence) -> Rule:
    ok = F.col(col).isin(list(values))
    return (
        f"accepted_values_{col}",
        "count_if",
        {"cond": ~F.coalesce(ok, F.lit(False))},
    )


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    ok = (c >= lo) & (c <= hi)
    return (
        f"in_range_{col}",
        "count_if",
        {"cond": ~F.coalesce(ok, F.lit(False))},
    )


def satisfies(name: str, condition: Column) -> Rule:
    """Rows VIOLATE when ``condition`` is false or NULL."""
    return (name, "count_if", {"cond": ~F.coalesce(condition, F.lit(False))})


def unique(*cols: str) -> Rule:
    return ("unique_" + "_".join(cols), "unique", {"cols": list(cols)})


def functional_dependency(lhs: Sequence[str], rhs: str) -> Rule:
    """Declared FD ``lhs -> rhs``: every lhs tuple must map to ONE
    rhs value (nulls count as a value — a null-and-value mix is a
    violation too, the usual denormalization-drift symptom).
    failing_rows = number of rows living in violating lhs groups —
    the audit-sized answer to "how much of the table disagrees"."""
    name = "fd_" + "_".join(lhs) + "__" + rhs
    return (name, "fd", {"lhs": list(lhs), "rhs": rhs})


def row_count_between(lo: int, hi: int) -> Rule:
    return (f"row_count_between_{lo}_{hi}", "row_count", {"lo": lo, "hi": hi})


def references(col: str, dim: DataFrame, dim_col: str) -> Rule:
    """Foreign-key check: non-NULL ``col`` values must appear in
    ``dim[dim_col]``. Runs as an anti-join against the DISTINCT key
    set — when the dimension is small it broadcasts; otherwise one
    key shuffle, never a row-wise collect."""
    return (f"references_{col}", "fk", {"col": col, "dim": dim, "dim_col": dim_col})


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules``; returns (rule, passed, failing_rows) with
    one row per rule. failing_rows for row_count rules is the amount
    outside the bound (0 when passing)."""
    names = [n for n, _, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    if not rules:
        # empty rule set passes trivially: an empty typed report
        return df.sparkSession.createDataFrame(
            [], "rule string, passed boolean, failing_rows bigint"
        )

    aggs = []
    for name, kind, p in rules:
        if kind == "count_if":
            aggs.append(
                F.count_if(p["cond"]).cast("bigint").alias(name)
            )
        elif kind == "row_count":
            n = F.count(F.lit(1))
            aggs.append(
                F.greatest(
                    F.lit(p["lo"]).cast("bigint") - n,
                    n - F.lit(p["hi"]).cast("bigint"),
                    F.lit(0).cast("bigint"),
                ).alias(name)
            )
        elif kind not in ("unique", "fk", "fd"):
            raise ValueError(f"unknown rule kind {kind!r}")

    scalar_kinds = ("count_if", "row_count")
    parts = []
    if aggs:
        wide = df.agg(*aggs)
        stack_expr = ", ".join(
            f"'{name}', `{name}`"
            for name, kind, _ in rules
            if kind in scalar_kinds
        )
        n_scalar = len([1 for _, k, _ in rules if k in scalar_kinds])
        parts.append(
            wide.select(
                F.expr(
                    f"stack({n_scalar}, {stack_expr}) as (rule, failing_rows)"
                )
            )
        )
    for name, kind, p in rules:
        if kind == "unique":
            dup = (
                df.groupBy(*[F.col(c) for c in p["cols"]])
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum("_n"), F.lit(0))
                    .cast("bigint")
                    .alias("failing_rows")
                )
                .select(F.lit(name).alias("rule"), "failing_rows")
            )
            parts.append(dup)
        elif kind == "fd":
            viol = (
                df.groupBy(*[F.col(c) for c in p["lhs"]])
                .agg(
                    F.count(F.lit(1)).alias("_n"),
                    # count nulls as a distinct rhs value: countDistinct
                    # ignores nulls, so add a has-null indicator
                    (
                        F.countDistinct(F.col(p["rhs"]))
                        + F.max(
                            F.when(F.col(p["rhs"]).isNull(), 1).otherwise(0)
                        )
                    ).alias("_nv"),
                )
                .filter(F.col("_nv") > 1)
                .agg(
                    F.coalesce(F.sum("_n"), F.lit(0))
                    .cast("bigint")
                    .alias("failing_rows")
                )
                .select(F.lit(name).alias("rule"), "failing_rows")
            )
            parts.append(viol)
        elif kind == "fk":
            orphans = (
                df.select(F.col(p["col"]).alias("_fk"))
                .filter(F.col("_fk").isNotNull())
                .join(
                    p["dim"].select(F.col(p["dim_col"]).alias("_fk")).distinct(),
                    "_fk",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("failing_rows"))
                .select(F.lit(name).alias("rule"), "failing_rows")
            )
            parts.append(orphans)

    report = parts[0]
    for p_df in parts[1:]:
        report = report.unionByName(p_df)
    return report.select(
        "rule", (F.col("failing_rows") == 0).alias("passed"), "failing_rows"
    )


def enforce(df: DataFrame, rules: Sequence[Rule]) -> None:
    """Write-time gate: raise ValueError listing every failed rule
    (errors raise, never print-and-continue — SURVEY §2.7 error
    model). The report is #rules rows; collecting it is metadata-
    sized, not data-sized."""
    failed = [
        (r["rule"], r["failing_rows"])
        for r in check(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError(
            "expectations failed: "
            + ", ".join(f"{name} ({n} failing rows)" for name, n in failed)
        )
