"""File-format ingestion with explicit corrupt-record routing —
the CSV / JSONL legs of the source family (the reference ingests
HTTP JSON only, main.py:1-638; a standalone engine also ingests the
files a data vendor actually ships).

Posture (the 100 TB rule the decode kernels already follow): a
malformed line must never kill the job OR silently vanish. Both
readers run Spark's PERMISSIVE mode with an explicit
``columnNameOfCorruptRecord`` column, and ``split_corrupt`` routes
rows into (clean, quarantine) DataFrames so the pipeline loads clean
rows and AUDITS the rest — the load is total: every input line lands
in exactly one side (tests pin the partition).

Scale notes: both readers are plain distributed file scans (splittable
by line); schemas are explicit (no inferSchema pass over 100 TB); the
corrupt column prunes away from the clean branch after the split, so
downstream plans don't carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON-lines reader: explicit schema + permissive corrupt
    capture. A line that fails to parse (or whose types don't fit)
    yields nulls with the raw line in ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV reader: explicit schema + permissive corrupt capture
    (wrong column count / unparsable types land in
    ``_corrupt_record``)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType,
) -> DataFrame:
    """XML reader (round 8): Spark 4 ships the XML source natively
    (the former spark-xml package, merged upstream) — one record per
    ``rowTag`` element, explicit schema, PERMISSIVE corrupt capture
    like the CSV/JSONL legs: a malformed element yields nulls with
    the raw element text in ``_corrupt_record``, so ``split_corrupt``
    quarantines it instead of killing or silently dropping.

    Scale note: unlike line-delimited text, an XML FILE is not
    splittable on arbitrary byte boundaries — parallelism is
    per-file. Vendors shipping XML at bulk ship many files; the scan
    distributes across them. Schemas are explicit (no inference pass).
    """
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the corrupt column pruned,
    quarantine rows carrying the raw offending line for audit. Every
    input row lands in exactly one side.

    The parsed frame is cached first: Spark refuses plans whose scan
    references ONLY the internal corrupt column (the quarantine
    branch would), and caching is the documented resolution — it also
    means the two branches share one parse instead of re-reading the
    files. At 100 TB the equivalent move is landing the parsed frame
    to a Bronze table and splitting from there; this helper is the
    in-memory form of that same two-phase shape."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "orc",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar sink (round 8): ORC or Parquet, optional hive-style
    ``partitionBy`` layout so downstream predicate filters prune
    whole directories. Spark supports both natively — no extra
    packages — and both are splittable, compressed, and carry column
    statistics, so scans push filters and prune columns for free."""
    if fmt not in ("orc", "parquet"):
        raise ValueError(f"fmt must be orc/parquet, got {fmt!r}")
    w = df.write.mode(mode).format(fmt)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_columnar(
    spark: SparkSession,
    path: str,
    fmt: str = "orc",
    schema: StructType | None = None,
    ignore_corrupt_files: bool = False,
) -> DataFrame:
    """Columnar source (round 8). Binary columnar formats have no
    row-level corrupt-record column — a torn file fails at the
    stripe/footer level — so the quarantine analogue is FILE-level:
    ``ignore_corrupt_files=True`` sets the per-read
    ``ignoreCorruptFiles`` option (scoped to this scan, not the
    session) and the SCAN skips unreadable files instead of killing
    the 100 TB job; the audit path is a directory listing diff, not
    a _corrupt_record column. Schemas normally come from the file
    footers (self-describing formats, no inference pass over data) —
    but footer-based schema RESOLUTION happens before the scan and
    does not honor the per-read option, so when corrupt files may be
    present pass ``schema`` explicitly (the 100 TB posture anyway:
    production tables have declared schemas)."""
    if fmt not in ("orc", "parquet"):
        raise ValueError(f"fmt must be orc/parquet, got {fmt!r}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if ignore_corrupt_files:
        r = r.option("ignoreCorruptFiles", "true")
    return r.load(path)
