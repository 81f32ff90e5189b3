"""Driver-style oracle gate: every registered query vs DuckDB SQL.

Mimics the driver's CORRECTNESS check: row count, column names, and
an order-insensitive exact value comparison (values canonicalized to
strings; floats via repr so only bitwise-equal doubles match — the
plans are designed for that, see plans/queries.py docstring).
"""

from __future__ import annotations

import math

import pytest

from etl_deltalake_spark.plans.registry import all_oracles, all_queries


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(cols, rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _spark_result(spark, sf_dir, fn):
    df = fn(spark, sf_dir)
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _duck_result(duck, sql):
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    fn = QUERIES[name]
    s_cols, s_rows = _spark_result(spark, sf_dir, fn)
    assert len(s_rows) > 0, f"{name}: Spark query returned 0 rows"
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle SQL)")
    d_cols, d_rows = _duck_result(duck, ORACLES[name])
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sc, dc = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_registry_entry():
    assert QUERIES, "no queries registered"
    missing = [n for n in ORACLES if n not in QUERIES]
    assert not missing, f"oracles without queries: {missing}"
