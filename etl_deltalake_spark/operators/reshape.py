"""Reshaping operators: melt/unpivot, pivot, explode (SURVEY §2.3).

The reference's signature transform chain (main.py:195-234): a wide
``json_normalize`` frame with ``'<id>.<field>'`` columns is melted
to long (R1), the key regex-split (R2), re-widened per id (R3), and
multi-valued strings are split+exploded (R5/R6).

Scale notes:
 - ``melt`` is a generate (explode) — no shuffle; output rows =
   rows × value-columns. Column pruning still applies to id_vars.
 - ``pivot`` with an explicit ``values`` list is one shuffle; WITHOUT
   the list Spark first runs a distinct scan to discover values —
   always pass ``values`` when known (we require it optional).
 - The wide→long→wide detour exists only because of json_normalize;
   ``explode_map`` is the idiomatic path for dict-of-dicts payloads
   (SURVEY §2.3 note) — parse as MapType and explode once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: Sequence[str] = (),
    value_vars: Sequence[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R1: wide → long (reference main.py:216, ``pd.melt``).

    Uses the native ``unpivot`` (Spark ≥3.4): a single Generate node,
    no shuffle, no Python.
    """
    ids = list(id_vars)
    values = list(value_vars) if value_vars is not None else [
        c for c in df.columns if c not in ids
    ]
    # Backtick-quote: the wide-JSON shape has dotted column names
    # ('122.name') that would otherwise parse as struct references.
    quote = lambda c: f"`{c.replace('`', '``')}`"  # noqa: E731
    return df.unpivot(
        [quote(c) for c in ids], [quote(c) for c in values], var_name, value_name
    )


def regex_split_key(
    df: DataFrame,
    col: str = "variable",
    pattern: str = r"(\d+)\.(.*)",
    key_name: str = "crypto_id",
) -> DataFrame:
    """R2: split ``'<id>.<field>'`` into (id, field) (main.py:219)."""
    return df.withColumn(key_name, F.regexp_extract(col, pattern, 1)).withColumn(
        col, F.regexp_extract(col, pattern, 2)
    )


def pivot_first(
    df: DataFrame,
    index: str | Sequence[str],
    columns: str,
    values: str,
    pivot_values: Sequence[str] | None = None,
) -> DataFrame:
    """R3: long → wide, ``aggfunc='first'`` (reference main.py:222).

    ``F.first`` on an unordered group is nondeterministic under
    duplicates (the reference inherits the same hazard from pandas);
    callers needing determinism should pre-dedup or use min/max.
    Pass ``pivot_values`` to skip the extra distinct-discovery job.
    """
    index_cols = [index] if isinstance(index, str) else list(index)
    grouped = df.groupBy(*index_cols)
    pivoted = grouped.pivot(columns, list(pivot_values)) if pivot_values else grouped.pivot(columns)
    return pivoted.agg(F.first(values))


def split_explode(
    df: DataFrame,
    col: str,
    split_pattern: str = ",\\s*",
    alt_delims: Sequence[str] = (";",),
    canonical_delim: str = ",",
) -> DataFrame:
    """R5+R6: normalize delimiters, split, explode (main.py:253-257).

    The reference replaces ';' with ',' then splits on ', '
    (main.py:253-255) — which silently fails to split when the
    semicolon had no trailing space. We normalize to a canonical
    delimiter and split on a regex tolerating optional whitespace
    instead (documented deviation; the quirk is a bug, not a
    semantic). One row per element; Generate node, no shuffle.
    """
    expr = F.col(col)
    for d in alt_delims:
        expr = F.regexp_replace(expr, d, canonical_delim)
    return df.withColumn(col, F.explode(F.split(expr, split_pattern)))


def explode_map(df: DataFrame, map_col: str, key_name: str = "key") -> DataFrame:
    """Idiomatic alternative to R1-R3 for dict-of-dicts payloads.

    ``select(explode(map))`` then flatten the value struct — the wide
    detour never happens (SURVEY §2.3 note).
    """
    exploded = df.select(F.explode(F.col(map_col)).alias(key_name, "_value"))
    return exploded.select(key_name, "_value.*")
