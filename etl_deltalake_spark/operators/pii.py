"""PII operators: synthetic email generation + masking (SURVEY §2.6).

The reference does both with row-at-a-time Python loops
(``iterrows`` at main.py:502, per-value loop at main.py:537-539).
Here they are pure column expressions — vectorized, deterministic,
and SQL-expressible (so the oracle can verify them).

U1 determinism note: the reference uses ``Faker().email()`` for the
local part (main.py:497), which is nondeterministic. We derive the
local part from a stable content hash instead (md5 prefix) — same
shape (``local@name.org``, main.py:499), reproducible across runs
and engines. A Faker-backed ``pandas_udf`` variant is provided for
fidelity, gated on the library being installed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def synth_email(name_col: str, email_col: str = "email") -> Column:
    """U1: deterministic synthetic email from a name column.

    ``<md5(name)[:8]>@<name-lowercased-no-spaces>.org`` — mirrors the
    reference's ``{local}@{row[name].lower()}.org`` (main.py:499)
    with a reproducible local part.
    """
    local = F.substring(F.md5(F.col(name_col)), 1, 8)
    domain = F.lower(F.regexp_replace(F.col(name_col), r"\s+", ""))
    return F.concat(local, F.lit("@"), domain, F.lit(".org")).alias(email_col)


def add_synth_email(df: DataFrame, name_col: str, email_col: str = "email") -> DataFrame:
    return df.withColumn(email_col, synth_email(name_col, email_col))


def mask_email(email_col: str, masked_col: str = "email_masked") -> Column:
    """U2: redact the local part, keep the domain (main.py:537-539).

    ``'*****@' + domain`` via substring_index — no Python loop.
    """
    return F.concat(F.lit("*****@"), F.substring_index(F.col(email_col), "@", -1)).alias(
        masked_col
    )


def add_masked_email(
    df: DataFrame, email_col: str, masked_col: str = "email_masked", drop_original: bool = True
) -> DataFrame:
    """U2 full op: add masked column, drop the original (P3, main.py:545)."""
    out = df.withColumn(masked_col, mask_email(email_col, masked_col))
    return out.drop(email_col) if drop_original else out


def faker_email_udf():
    """Fidelity variant of U1: Faker-backed pandas UDF (nondeterministic).

    Gated: Faker is not installed in this container; raises
    ImportError with guidance rather than failing at import time.
    """
    try:
        from faker import Faker
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "faker is not installed; use synth_email() (deterministic) instead"
        ) from e
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _gen(names: pd.Series) -> pd.Series:
        fk = Faker()
        Faker.seed(42)
        return pd.Series(
            [f"{fk.email().split('@')[0]}@{str(n).lower()}.org" for n in names]
        )

    return _gen
