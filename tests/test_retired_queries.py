"""Oracle coverage for queries retired from the capped driver
registry (see plans/registry.py docstring): they remain part of the
engine surface and must stay correct — pytest carries the gate the
driver no longer has slots for."""

from __future__ import annotations

import pytest

from etl_deltalake_spark.plans.oracles import ORACLES
from etl_deltalake_spark.plans.registry import (
    REGISTERED,
    RETIRED,
    RETIRED_R4,
    RETIRED_R5,
    SLOTLESS,
    retired_queries,
)
from tests.test_oracle import _canon_rows, _duck_result, _spark_result


def test_registered_and_retired_are_disjoint():
    assert not set(REGISTERED) & set(RETIRED + RETIRED_R4 + RETIRED_R5 + SLOTLESS)
    assert not set(RETIRED) & set(RETIRED_R4 + RETIRED_R5 + SLOTLESS)
    assert not set(RETIRED_R4) & set(RETIRED_R5 + SLOTLESS)
    assert not set(RETIRED_R5) & set(SLOTLESS)


@pytest.mark.parametrize("name", sorted(RETIRED + RETIRED_R4 + RETIRED_R5 + SLOTLESS))
def test_retired_query_vs_oracle(name, spark, duck, sf_dir):
    fn = retired_queries()[name]
    s_cols, s_rows = _spark_result(spark, sf_dir, fn)
    assert len(s_rows) > 0, f"{name}: Spark query returned 0 rows"
    assert name in ORACLES, f"{name}: retired query lost its oracle"
    d_cols, d_rows = _duck_result(duck, ORACLES[name].strip())
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count"
    sc, dc = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: value mismatch"
