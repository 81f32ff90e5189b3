"""Fixture catalog: the driver-generated parquet tables.

Mirrors the reference's "open a stored table" source (SURVEY §2.1
S4, reference main.py:314) but lazily: ``spark.read.parquet`` is a
scan node Catalyst can push filters/projections into, not an eager
materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Lazy parquet scan of one fixture table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader
    rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as a long that we convert to a microsecond timestamp here
    (truncating division — matches DuckDB's nanos→micros cast).
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        # Runtime-settable SQL conf — required even when the session
        # wasn't built by our factory (e.g. the external driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
