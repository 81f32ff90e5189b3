from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Keep local test runs lightweight; the bench sizes up via env.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from etl_deltalake_spark.session import get_spark

    spark = get_spark("etl-deltalake-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # DuckDB's default 32 threads fragment the process heap into
    # ~40k anonymous mmaps PER heavy PQ-chain oracle (glibc arena
    # churn); several such oracles in one session approach
    # vm.max_map_count (65530) and every later allocation fails as
    # OutOfMemory "bad allocation". 8 threads keep the same queries
    # ~5x under the map budget AND faster (32 threads oversubscribe
    # against the Spark JVM sharing the box). Measured: recall-curve
    # oracle 40074 maps/3.4s at 32 threads vs 7201 maps/1.0s at 8.
    con.execute("SET threads=8")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
