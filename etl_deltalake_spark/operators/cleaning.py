"""Cleaning / normalization operators (SURVEY §2.4, C1-C10).

Re-expresses the reference's Silver-layer scalar transforms
(reference main.py:237-342) as pure column expressions — no
row-at-a-time Python, everything stays inside whole-stage codegen.

Pinned reference semantics:
 - C1 empty-string → null BEFORE sentinel fill (main.py:318 then
   332) — an empty string ends up as the sentinel, not ''.
 - C5 string→numeric coercion is pandas ``errors='coerce'``:
   unparseable → null (Spark ``cast('double')`` matches), then C4
   fills 0 (main.py:325 then C4).
 - C2 the country remap is a value→value dictionary substitution
   (main.py:265, dict at 572-590); at scale this is a broadcast
   lookup join, both forms provided.
 - C9 fixed-3-decimals STRING formatting of volume_usd
   (main.py:287-288) — ``format_string('%.3f', x)``, NOT
   ``format_number`` (which inserts thousands separators).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def require_min_columns(df: DataFrame, min_cols: int, context: str = "") -> DataFrame:
    """P1 (reference main.py:209-210): schema-arity guard.

    The reference prints and implicitly returns None when the
    normalized frame has fewer than 17 columns; here a too-narrow
    frame raises (fail-fast error model, SURVEY §2.7). Driver-side
    check on the schema — no job runs.
    """
    if len(df.columns) < min_cols:
        where = f" in {context}" if context else ""
        raise ValueError(
            f"expected at least {min_cols} columns{where}, got "
            f"{len(df.columns)}: {df.columns}"
        )
    return df


def string_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def numeric_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def empty_to_null(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """C1: '' → NULL on string columns (reference main.py:262, 318)."""
    cols = cols if cols is not None else string_cols(df)
    exprs = {c: F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c) for c in cols}
    return df.select(*[exprs.get(c, F.col(c)).alias(c) for c in df.columns])


def remap_values(df: DataFrame, col: str, mapping: Mapping[str, str]) -> DataFrame:
    """C2: dictionary value substitution (reference main.py:265).

    Implemented as a CASE chain — constant-folded by Catalyst, no
    shuffle. For unbounded mappings prefer ``remap_via_lookup``.
    """
    expr: Column = F.col(col)
    out = expr
    for k, v in mapping.items():
        out = F.when(expr == k, F.lit(v)).otherwise(out)
    return df.withColumn(col, out)


def remap_via_lookup(df: DataFrame, col: str, lookup: DataFrame) -> DataFrame:
    """C2 at scale: broadcast-join a (key, value) lookup table.

    ``lookup`` must have columns (key, value). Unmatched keys keep
    their original value — same semantics as the dict remap.
    """
    lk = F.broadcast(lookup.select(F.col("key"), F.col("value")))
    return (
        df.join(lk, df[col] == lk.key, "left")
        .withColumn(col, F.coalesce(lk.value, df[col]))
        .drop("key", "value")
    )


def fill_string_sentinel(
    df: DataFrame, sentinel: str = "Sin Dato", cols: Sequence[str] | None = None
) -> DataFrame:
    """C3: null → sentinel on string columns (reference main.py:272, 332)."""
    cols = cols if cols is not None else string_cols(df)
    return df.na.fill(sentinel, subset=list(cols))


def fill_numeric_zero(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """C4: null → 0 on numeric columns (reference main.py:281, 325)."""
    cols = cols if cols is not None else numeric_cols(df)
    return df.na.fill(0, subset=list(cols))


def coerce_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """C5+C7: string → double, unparseable → null (main.py:325).

    ``try_cast``, not ``cast``: Spark 4 runs ANSI mode by default,
    where a plain cast RAISES on unparseable input — pandas
    ``errors='coerce'`` semantics require null.
    """
    return df.select(
        *[
            F.col(c).try_cast("double").alias(c) if c in cols else F.col(c)
            for c in df.columns
        ]
    )


def round_cols(df: DataFrame, cols: Sequence[str], scale: int = 3) -> DataFrame:
    """C6: round numeric columns (reference main.py:326)."""
    return df.select(
        *[F.round(c, scale).alias(c) if c in cols else F.col(c) for c in df.columns]
    )


def format_decimal_str(col: str, scale: int = 3) -> Column:
    """C9: fixed-decimals string, no grouping separators (main.py:288)."""
    return F.format_string(f"%.{scale}f", F.col(col))


def clean_frame(
    df: DataFrame,
    numeric_coerce: Sequence[str] = (),
    sentinel: str = "Sin Dato",
    round_scale: int | None = 3,
) -> DataFrame:
    """C10: schema-driven dispatch (replaces main.py:268-285 dtype loop).

    Strings: '' → null → sentinel. ``numeric_coerce`` columns:
    cast double (coerce) → 0-fill → round. Native numerics: 0-fill.
    Matches the reference quirk that EVERY non-float column gets the
    sentinel (SURVEY §2.4 note on main.py:330).
    """
    out = empty_to_null(df)
    out = coerce_numeric(out, numeric_coerce)
    out = fill_numeric_zero(out)
    if round_scale is not None and numeric_coerce:
        out = round_cols(out, numeric_coerce, round_scale)
    out = fill_string_sentinel(out, sentinel)
    return out
