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

    Casefold exemption (round-8 inventory,
    tests/test_misc_surface.py): this is bare ``F.lower``, NOT
    text.folded_lower — deliberate. The column is a fixture NAME
    used as an email domain, the reference op being mirrored is a
    plain ``.lower()``, and the q_mask_email oracle uses plain
    ``LOWER`` — routing through the İ-fold would change the
    reference-parity contract for a column that cannot carry İ.
    folded_lower's one-definition rule governs TEXT-corpus columns
    (tokenization/dedup canonical forms), not identifier mirroring.
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


# Deterministic, RE2-safe PII patterns (no backtracking constructs,
# no lookarounds — the DuckDB oracle runs the same patterns on RE2).
# Order matters: emails first (an email contains digit runs a phone
# pattern could partially claim), then IPv4, then phones. The phone
# pattern is STRUCTURAL, not a bare digit-run count: either an
# optional 1-3 digit country code followed by 2-4 separator-delimited
# groups of 3-4 digits (`+1 555-123-4567`, `555 123 4567`), or a
# bare 10-15 digit run. Date/time shapes can never match it — ISO
# dates split as 4-2-2 and clock times as 2-2, and a 2-digit group
# is not a legal phone group, so `2024-01-15 12:30` and even two
# adjacent dates (16 digits, singly separated — the trap the old
# any-separator pattern fell into) are left untouched.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b(?:\d{1,3}(?:[- ]\d{3,4}){2,4}|\d{10,15})\b", "<PHONE>"),
)


def redact_pii(col: str) -> Column:
    """Redact emails, IPv4 addresses, and phone-like digit runs from
    free text — the compliance scrub a training corpus runs before
    anything else sees the text (extends this module's single-column
    email masking, reference main.py:517-551, to in-text PII).

    Pure chained ``regexp_replace`` — scan-side, linear-time
    patterns, no UDFs; the oracle mirrors each pattern with DuckDB's
    global-flag regexp_replace. Replacement placeholders keep the
    document's structure analyzable (token counts change
    predictably instead of leaving holes).
    """
    out = F.col(col)
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_hits(col: str) -> dict[str, Column]:
    """Per-category PII match counts — the audit signal that decides
    whether a document is dropped vs scrubbed.

    Counts follow ``redact_pii``'s PRECEDENCE: each category counts
    matches on the text with the earlier categories already redacted,
    so a digit run inside an email is an email hit, never also a
    phone hit — the counts describe exactly what the scrub replaces.
    """
    out: dict[str, Column] = {}
    cur = F.col(col)
    for name, pattern, token in PII_PATTERNS:
        out[name] = F.size(
            F.regexp_extract_all(cur, F.lit(pattern), 0)
        ).cast("bigint")
        cur = F.regexp_replace(cur, pattern, token)
    return out


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-row k-anonymity annotation (round 5) — the compliance
    check behind every quasi-identifier release decision: a row is
    k-anonymous iff at least ``k`` rows share its full
    quasi-identifier combination (Sweeney 2002, public model). Rows
    below the threshold get ``suppress = true`` — the caller's
    release pipeline drops or generalizes exactly those.

    One window count over the quasi-identifier key (a single shuffle;
    at 100 TB prefer the groupBy-count + broadcast-join form when the
    distinct-combination count is dimension-sized). Output: the input
    columns + anon_set_size + suppress.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*quasi_cols)
    return df.withColumn(
        "anon_set_size", F.count(F.lit(1)).over(w)
    ).withColumn("suppress", F.col("anon_set_size") < k)


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row release-readiness summary: distinct quasi-identifier
    combinations, how many fall below k, rows suppressed, the
    minimum anonymity-set size, and the suppression fraction."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).alias(
            "groups_below_k"
        ),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias(
            "rows_suppressed"
        ),
        F.min("_n").alias("min_set_size"),
        F.round(
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
            / F.sum("_n"),
            6,
        ).alias("suppressed_frac"),
    )
