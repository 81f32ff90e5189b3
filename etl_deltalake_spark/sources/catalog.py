"""Fixture catalog: the driver-generated parquet tables.

Mirrors the reference's "open a stored table" source (SURVEY §2.1
S4, reference main.py:314) but lazily: ``spark.read.parquet`` is a
scan node Catalyst can push filters/projections into, not an eager
materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
    """Lazy parquet scan of one fixture table."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
