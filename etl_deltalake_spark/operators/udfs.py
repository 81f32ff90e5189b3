"""Vectorized (Arrow-batched) pandas UDFs — the engine's sanctioned
Python escape hatch (SURVEY §2.6: replaces the reference's iterrows
loops, main.py:502, 537-539).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the eval type from REAL ``pd.Series`` annotations; stringified
hints break the inference.

Row-at-a-time ``F.udf`` is banned from hot paths; these run one
Python invocation per Arrow batch (~10-100× less crossing overhead),
pipeline scan-side, and need no shuffle.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def n_chars(s: pd.Series) -> pd.Series:
    """Character count via the vectorized pandas string kernel."""
    return s.str.len().astype("int64")


@pandas_udf("bigint")
def n_spaces(s: pd.Series) -> pd.Series:
    """Space count — stands in for any per-string Python metric."""
    return s.str.count(" ").astype("int64")
