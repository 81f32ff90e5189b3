"""Oracle coverage for queries retired from the capped driver
registry (see plans/registry.py docstring): they remain part of the
engine surface and must stay correct — pytest carries the gate the
driver no longer has slots for.

Everything here derives from the registry itself (RETIRED_GROUPS /
retired_queries()), never from hand-copied name lists: the round-6
rotation proved a hand-listed parametrize silently drops the gate for
newly retired queries (q_ann_bucket/q_rollup went ungated for one
round). A rotation now only appends its RETIRED_R{N} tuple to
RETIRED_GROUPS and this file follows mechanically.
"""

from __future__ import annotations

import itertools

import pytest

from etl_deltalake_spark.plans.oracles import ORACLES
from etl_deltalake_spark.plans.registry import (
    REGISTERED,
    RETIRED_GROUPS,
    retired_queries,
)
from tests.test_oracle import _canon_rows, _duck_result, _spark_result

# Oracle-paired names with no driver slot AND no pytest oracle gate
# here because another gate is strictly stronger or the query is
# non-deterministic by design. Every exemption must name its carrier.
_EXEMPT_FROM_ORACLE_GATE: dict[str, str] = {}


def test_registered_and_retired_are_disjoint():
    """No name may appear in two groups, nor in a group and the
    driver registry — derived from RETIRED_GROUPS so a new rotation
    wave is checked automatically."""
    groups = (REGISTERED, *RETIRED_GROUPS)
    for a, b in itertools.combinations(range(len(groups)), 2):
        overlap = set(groups[a]) & set(groups[b])
        assert not overlap, f"groups {a} and {b} overlap: {sorted(overlap)}"


def test_retired_queries_matches_groups():
    """retired_queries() must expose exactly the RETIRED_GROUPS union
    (guards against the function and the tuple drifting apart)."""
    expected = {name for group in RETIRED_GROUPS for name in group}
    assert set(retired_queries()) == expected


def test_every_oracle_is_graded_somewhere():
    """Meta-gate: every SQL oracle in ORACLES must be graded either by
    the driver (REGISTERED) or by this file's parametrize
    (retired_queries()) — an oracle that exists but is run nowhere is
    dead grading surface."""
    graded = set(REGISTERED) | set(retired_queries()) | set(_EXEMPT_FROM_ORACLE_GATE)
    ungraded = set(ORACLES) - graded
    assert not ungraded, f"oracles with no grading surface: {sorted(ungraded)}"


@pytest.mark.parametrize("name", sorted(retired_queries()))
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
