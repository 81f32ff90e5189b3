"""Data-quality expectations (operators/expectations.py) and SCD
Type-2 merge (operators/scd.py) semantics on hand-built fixtures;
cross-engine value gates are the q_expectations / q_scd2 oracles in
tests/test_retired_queries.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators import expectations as X
from etl_deltalake_spark.operators.scd import scd2_init, scd2_merge


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (2, "zz", -5.0),
            (3, None, 30.0),
        ],
        ["id", "cat", "val"],
    )


def test_each_rule_kind(spark, frame):
    report = {
        r["rule"]: (r["passed"], r["failing_rows"])
        for r in X.check(
            frame,
            [
                X.not_null("id"),
                X.not_null("cat"),
                X.unique("id"),
                X.accepted_values("cat", ["a", "b"]),
                X.in_range("val", 0.0, 25.0),
                X.row_count_between(1, 3),
                X.satisfies("val_pos_when_a", (F.col("cat") != "a") | (F.col("val") > 0)),
            ],
        ).collect()
    }
    assert report["not_null_id"] == (True, 0)
    assert report["not_null_cat"] == (False, 1)
    assert report["unique_id"] == (False, 2)  # both id=2 rows count
    # NULL cat and 'zz' both violate accepted_values
    assert report["accepted_values_cat"] == (False, 2)
    # -5.0 and 30.0 out of range
    assert report["in_range_val"] == (False, 2)
    assert report["row_count_between_1_3"] == (False, 1)  # 4 rows, hi=3
    assert report["val_pos_when_a"] == (True, 0)


def test_enforce_raises_with_all_failures(spark, frame):
    with pytest.raises(ValueError, match="not_null_cat.*unique_id") as ei:
        X.enforce(frame, [X.not_null("cat"), X.unique("id"), X.not_null("id")])
    assert "not_null_id" not in str(ei.value)
    X.enforce(frame, [X.not_null("id")])  # passing set is silent


def test_references_rule_counts_orphans(spark, frame):
    dim = spark.createDataFrame([("a",), ("b",)], ["code"])
    report = {
        r["rule"]: (r["passed"], r["failing_rows"])
        for r in X.check(frame, [X.references("cat", dim, "code")]).collect()
    }
    # 'zz' is an orphan; the NULL cat row is NOT a violation
    assert report["references_cat"] == (False, 1)


def test_duplicate_rule_names_rejected(spark, frame):
    with pytest.raises(ValueError, match="duplicate rule"):
        X.check(frame, [X.not_null("id"), X.not_null("id")])


def _scd_rows(df):
    return sorted(
        (
            (
                r["k"],
                r["attr"],
                str(r["valid_from"]),
                str(r["valid_to"]),
                r["is_current"],
            )
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )


def test_scd2_changed_unchanged_new_absent(spark):
    b1 = spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-01"), (3, None, "2024-01-01")],
        ["k", "attr", "eff"],
    )
    t1 = scd2_init(b1, ["k"], ["attr"], "eff")
    # k=1 changed, k=2 absent (kept), k=3 null->null unchanged, k=4 new
    b2 = spark.createDataFrame(
        [(1, "X", "2024-02-01"), (3, None, "2024-02-01"), (4, "w", "2024-02-01")],
        ["k", "attr", "eff"],
    )
    t2 = scd2_merge(t1, b2, ["k"], ["attr"], "eff")
    assert _scd_rows(t2) == [
        (1, "x", "2024-01-01", "2024-02-01", False),
        (1, "X", "2024-02-01", "9999-12-31", True),
        (2, "y", "2024-01-01", "9999-12-31", True),
        (3, None, "2024-01-01", "9999-12-31", True),
        (4, "w", "2024-02-01", "9999-12-31", True),
    ]


def test_scd2_null_transition_opens_version(spark):
    t1 = scd2_init(
        spark.createDataFrame(
            [(1, None, "2024-01-01")], "k bigint, attr string, eff string"
        ),
        ["k"], ["attr"], "eff",
    )
    t2 = scd2_merge(
        t1,
        spark.createDataFrame([(1, "now-set", "2024-03-01")], ["k", "attr", "eff"]),
        ["k"], ["attr"], "eff",
    )
    assert _scd_rows(t2) == [
        (1, None, "2024-01-01", "2024-03-01", False),
        (1, "now-set", "2024-03-01", "9999-12-31", True),
    ]


def test_scd2_second_merge_preserves_closed_history(spark):
    b = lambda attr, eff: spark.createDataFrame(
        [(1, attr, eff)], ["k", "attr", "eff"]
    )
    t = scd2_init(b("a", "2024-01-01"), ["k"], ["attr"], "eff")
    t = scd2_merge(t, b("b", "2024-02-01"), ["k"], ["attr"], "eff")
    t = scd2_merge(t, b("c", "2024-03-01"), ["k"], ["attr"], "eff")
    assert _scd_rows(t) == [
        (1, "a", "2024-01-01", "2024-02-01", False),
        (1, "b", "2024-02-01", "2024-03-01", False),
        (1, "c", "2024-03-01", "9999-12-31", True),
    ]


def test_fk_combines_with_scalar_rules(spark, frame):
    """references() must compose with count_if rules in one check()
    call — the module docstring's own recommended pairing (previously
    the fk rule name leaked into the scalar stack() and crashed)."""
    dim = spark.createDataFrame([("a",), ("b",)], ["code"])
    report = {
        r["rule"]: (r["passed"], r["failing_rows"])
        for r in X.check(
            frame,
            [X.not_null("cat"), X.references("cat", dim, "code"), X.unique("id")],
        ).collect()
    }
    assert report["not_null_cat"] == (False, 1)
    assert report["references_cat"] == (False, 1)
    assert report["unique_id"] == (False, 2)


def test_empty_rule_set_passes(spark, frame):
    assert X.check(frame, []).count() == 0
    X.enforce(frame, [])  # no raise


def test_scd2_null_keyed_rows_not_dropped(spark):
    """A NULL business key never matches (SQL MERGE semantics) but
    the rows must not vanish: the open row keeps, the update opens."""
    t1 = scd2_init(
        spark.createDataFrame(
            [(None, "orphan", "2024-01-01"), (1, "a", "2024-01-01")],
            "k bigint, attr string, eff string",
        ),
        ["k"], ["attr"], "eff",
    )
    t2 = scd2_merge(
        t1,
        spark.createDataFrame(
            [(None, "new-orphan", "2024-02-01")],
            "k bigint, attr string, eff string",
        ),
        ["k"], ["attr"], "eff",
    )
    rows = sorted(
        ((r["k"], r["attr"], r["is_current"]) for r in t2.collect()),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1] or ""),
    )
    assert rows == [
        (None, "new-orphan", True),   # NULL-keyed update opens
        (None, "orphan", True),       # NULL-keyed open row kept
        (1, "a", True),
    ]


def test_functional_dependency_rule(spark):
    """FD audit (round 8): a clean lhs->rhs table passes; injected
    drift fails with failing_rows counting every row in violating
    groups; a null mixed with a value in one group violates, while an
    all-null group maps to one 'value' and passes."""
    from etl_deltalake_spark.operators.expectations import (
        check,
        functional_dependency,
    )
    from pyspark.sql import Row

    clean = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v=None),
         Row(k=3, v=None)]
    )
    rep = {r["rule"]: r for r in check(
        clean, [functional_dependency(["k"], "v")]
    ).collect()}
    r = rep["fd_k__v"]
    assert r["passed"] and r["failing_rows"] == 0

    dirty = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="B"), Row(k=1, v="a"),  # 3 rows violate
         Row(k=2, v="b"),
         Row(k=4, v="x"), Row(k=4, v=None)]                  # null+value: 2
    )
    rep = {r["rule"]: r for r in check(
        dirty, [functional_dependency(["k"], "v")]
    ).collect()}
    r = rep["fd_k__v"]
    assert not r["passed"] and r["failing_rows"] == 5
