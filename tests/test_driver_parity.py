"""Driver-harness parity gate for the DuckDB oracles.

Round-5 lesson (VERDICT.md r5, Wrong #1): the heavy PQ-chain oracles
OOM'd DuckDB in the DRIVER's harness (default 32-thread connection →
glibc arena churn → vm.max_map_count exhaustion) while passing under
pytest, because the ``SET threads=8`` mitigation lived only in the
pytest fixture the driver never loads. The fix embeds the pragmas in
the oracle STRINGS (plans/oracles.py bottom); this module replays the
full registered oracle set the way the driver does — a fresh DEFAULT
connection, no fixture caps, sf0.01 — so that class of
harness-divergence can never ship green again.
"""

from __future__ import annotations

import duckdb

from etl_deltalake_spark.plans.oracles import HEAVY_ORACLES
from etl_deltalake_spark.plans.registry import all_oracles

DRIVER_SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _map_count() -> int:
    with open("/proc/self/maps") as fh:
        return sum(1 for _ in fh)


def test_heavy_oracles_carry_embedded_pragmas():
    """Every heavy-chain oracle must self-cap threads: a fresh default
    DuckDB connection (the driver) sees only the SQL string."""
    oracles = all_oracles()
    for name in HEAVY_ORACLES:
        if name not in oracles:
            continue  # slotless/retired members aren't driver-graded
        assert oracles[name].lstrip().startswith("SET threads="), (
            f"{name}: heavy oracle lacks the embedded thread cap — the "
            "driver grades it on a default 32-thread connection"
        )


def test_all_driver_oracles_on_default_connection():
    """Replay ALL registered oracles sequentially on one DEFAULT
    connection at the driver's scale factor, then assert the process
    stayed far below the vm.max_map_count ceiling (65530).

    This is the exact failure mode of CORRECTNESS_r05's one red row:
    individual oracles pass, the cumulative sequential replay
    fragments the heap until a later allocation dies.
    """
    con = duckdb.connect()  # deliberately NO SET threads / memory_limit
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{DRIVER_SF_DIR}/{t}.parquet')"
        )
    try:
        for name, sql in sorted(all_oracles().items()):
            rows = con.execute(sql).fetchall()
            assert rows, f"{name}: oracle returned 0 rows on default connection"
            maps = _map_count()
            assert maps < 30000, (
                f"{name}: process at {maps} memory maps after this oracle — "
                f"approaching the 65530 vm.max_map_count ceiling that "
                f"killed CORRECTNESS_r05's q_ann_recall row"
            )
    finally:
        con.close()
