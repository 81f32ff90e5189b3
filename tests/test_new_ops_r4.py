"""Property tests for the round-4 second-half operators: guarantees
that the oracle queries can't express (partitioning invariance, exact
proportions, adversarial edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.sources.catalog import load_table


def test_heavy_hitters_partitioning_invariant(spark, sf_dir):
    """The exact result must be identical whether Misra-Gries runs
    on 1 partition or 32 — candidates may differ per partitioning,
    the exact recount + threshold may not."""
    from etl_deltalake_spark.operators.stats import heavy_hitters

    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
    ).filter(F.col("word") != "")

    def run(parts: int):
        return sorted(
            tuple(r)
            for r in heavy_hitters(
                words.repartition(parts), "word", num=1, denom=100
            ).collect()
        )

    a, b = run(1), run(32)
    assert a == b and len(a) > 0


def test_heavy_hitters_matches_plain_groupby(spark, sf_dir):
    """Against the brute-force groupBy+filter on a column with small
    cardinality where both are cheap."""
    from etl_deltalake_spark.operators.stats import heavy_hitters

    orders = load_table(spark, "orders", sf_dir)
    got = sorted(
        tuple(r)
        for r in heavy_hitters(
            orders, "o_orderpriority", num=1, denom=10
        ).collect()
    )
    n = orders.count()
    want = sorted(
        (r["o_orderpriority"], r["cnt"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
        if r["cnt"] * 10 >= n
    )
    assert got == want and len(want) > 0


def test_stratified_split_exact_proportions(spark):
    """Every stratum must split floor-exactly by the weights:
    integer cutoff ranks mean each split's count deviates from its
    ideal fractional share by less than 1 row, per stratum — and the
    assignment is deterministic across partitionings."""
    from etl_deltalake_spark.operators.curation import stratified_split

    rows = [(i, "s1" if i < 97 else "s2") for i in range(137)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_split(
        df, ["stratum"], "id", {"train": 8, "val": 1, "test": 1}
    )
    counts = {
        (r["stratum"], r["split"]): r["n"]
        for r in out.groupBy("stratum", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for stratum, total in (("s1", 97), ("s2", 40)):
        for split, w in (("train", 8), ("val", 1), ("test", 1)):
            n = counts.get((stratum, split), 0)
            exact = total * w / 10
            assert abs(n - exact) < 1, (stratum, split, n, exact)
    # determinism
    again = {
        (r["stratum"], r["split"]): r["n"]
        for r in stratified_split(
            df.repartition(7), ["stratum"], "id",
            {"train": 8, "val": 1, "test": 1},
        )
        .groupBy("stratum", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == counts


def test_ab_welch_singleton_variant_yields_null_t(spark):
    from etl_deltalake_spark.operators.stats import ab_welch

    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "a", 2.0), ("g", "b", 5.0)],
        "grp string, variant string, v double",
    )
    row = ab_welch(df, ["grp"], "variant", "v", a="a", b="b").collect()[0]
    assert row["n_a"] == 2 and row["n_b"] == 1
    assert row["t_stat"] is None


def test_triangle_count_known_graph(spark):
    """K4 minus one edge: nodes 1-2-3 and 2-3-4 form two triangles;
    1 and 4 are in one each, 2 and 3 in two each."""
    from etl_deltalake_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}

    # direction + duplicate edges must not change anything
    noisy = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    got2 = {
        r["node"]: r["n_triangles"] for r in triangle_count(noisy).collect()
    }
    assert got2 == got


def test_scd2_snapshot_boundary_semantics(spark):
    """valid_from is inclusive, valid_to exclusive: a row closed at
    2024-02-01 is visible AT 2024-01-31 and at its open date, but
    not at 2024-02-01."""
    from etl_deltalake_spark.operators.scd import scd2_snapshot

    tbl = spark.createDataFrame(
        [(1, "x", "2024-01-01", "2024-02-01", False),
         (1, "y", "2024-02-01", "9999-12-31", True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
        "is_current",
    )
    at = lambda d: {
        r["attr"] for r in scd2_snapshot(tbl, d).collect()
    }
    assert at("2024-01-01") == {"x"}
    assert at("2024-01-31") == {"x"}
    assert at("2024-02-01") == {"y"}


def test_ab_welch_ignores_null_metric_values(spark):
    """A NULL metric value must not count toward n or shift the
    mean: [1.0, NULL, 3.0] vs [5.0, 7.0] gives n_a=2, mean_a=2.0."""
    from etl_deltalake_spark.operators.stats import ab_welch

    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "a", None), ("g", "a", 3.0),
         ("g", "b", 5.0), ("g", "b", 7.0)],
        "grp string, variant string, v double",
    )
    row = ab_welch(df, ["grp"], "variant", "v", a="a", b="b").collect()[0]
    assert row["n_a"] == 2 and row["n_b"] == 2
    assert row["mean_a"] == 2.0 and row["mean_b"] == 6.0


def test_bpe_encode_ascii_whitespace_contract(spark):
    """Non-ASCII whitespace (U+00A0) is NOT a separator in training
    (Java \\s is ASCII-only) — encode must treat it identically or
    token counts diverge from bpe_vocab."""
    from collections import Counter

    from etl_deltalake_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
        bpe_vocab,
        word_freqs,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab ab ab"), (2, "ab ab")], "doc_id long, text string"
    )
    wf = word_freqs(docs, "text")
    merges, final = bpe_train(wf, num_merges=3)
    enc = bpe_encode(docs, "doc_id", "text", merges)
    enc_counts = Counter(
        tok for r in enc.collect() for tok in r["tokens"]
    )
    vocab = {r["token"]: r["freq"] for r in bpe_vocab(final).collect()}
    assert dict(enc_counts) == vocab


def test_ancestor_paths_known_tree_and_early_exit(spark):
    """1→2→3 chain plus isolated 4→5: paths and depths exact; the
    frontier loop must early-exit, not run to max_depth."""
    from etl_deltalake_spark.operators.graph import ancestor_paths

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "child long, parent long"
    )
    got = sorted(
        (r["node"], r["ancestor"], r["depth"])
        for r in ancestor_paths(edges, "child", "parent", max_depth=50).collect()
    )
    assert got == [(1, 2, 1), (1, 3, 2), (2, 3, 1), (4, 5, 1)]


def test_apply_cdc_rejects_unknown_ops(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql.utils import PySparkRuntimeError

    from etl_deltalake_spark.operators.reconcile import apply_cdc

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "b", "UPSERT")], "k long, v string, op string"
    )
    with pytest.raises(Exception) as e:
        apply_cdc(base, changes, ["k"]).collect()
    assert "unknown op" in str(e.value)


def test_grouped_isotonic_matches_reference_pava(spark, sf_dir):
    """Distributed PAVA vs an independent driver-side reference on
    the same (x, y, id)-sorted sequences, plus the isotonic
    optimality conditions: fit is non-decreasing and preserves the
    group's sum (least-squares projection property)."""
    from etl_deltalake_spark.operators.stats import grouped_isotonic

    from pyspark.sql import Window

    # the fixture has duplicate (orderkey, linenumber) pairs, so a
    # derived key is NOT unique — assign a deterministic unique rid
    # via a total-order row_number
    w = Window.orderBy(
        "l_orderkey", "l_linenumber", "l_shipdate", "x", "y"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
        "l_orderkey", "l_linenumber", "l_shipdate",
    ).withColumn("rid", F.row_number().over(w).cast("long")).drop(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    out = grouped_isotonic(li, ["l_returnflag"], "x", "y", "rid")
    rows = out.collect()
    assert len(rows) == li.count()

    def ref_pava(ys):
        sums, cnts = [], []
        for v in ys:
            sums.append(float(v))
            cnts.append(1)
            while len(sums) > 1 and sums[-2] * cnts[-1] > sums[-1] * cnts[-2]:
                s, c = sums.pop(), cnts.pop()
                sums[-1] += s
                cnts[-1] += c
        fit = []
        for s, c in zip(sums, cnts):
            fit.extend([s / c] * c)
        return fit

    by_group: dict = {}
    for r in li.collect():
        by_group.setdefault(r["l_returnflag"], []).append(
            (r["x"], r["y"], r["rid"])
        )
    got = {
        (r["l_returnflag"], r["rid"]): r["y_iso"] for r in rows
    }
    for g, pts in by_group.items():
        pts.sort()
        want = ref_pava([y for _, y, _ in pts])
        fits = [got[(g, rid)] for _, _, rid in pts]
        assert fits == [round(w, 9) for w in want], f"group {g} diverged"
        # optimality conditions
        assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))
        assert abs(sum(fits) - sum(y for _, y, _ in pts)) < 1e-3


def test_bloom_probe_is_scan_side_no_exchange(spark, sf_dir):
    """The Bloom membership test must compile to pure scan-side
    expressions — zero exchanges in the probe plan (the whole point
    of the runtime-filter pattern)."""
    from etl_deltalake_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from etl_deltalake_spark.plans.inspect import plan_string

    dim = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 9000
    )
    words = bloom_build(dim, "c_custkey", n_words=64)
    probe = load_table(spark, "orders", sf_dir).filter(
        bloom_might_contain(F.col("o_custkey"), words)
    )
    plan = plan_string(probe)
    assert "Exchange" not in plan, plan


def test_winsorize_bounds_join_is_broadcast(spark, sf_dir):
    """The per-group bounds table must come back as a
    BroadcastHashJoin — raw rows never shuffle for the clamp."""
    from etl_deltalake_spark.operators.stats import winsorize
    from etl_deltalake_spark.plans.inspect import plan_string

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    plan = plan_string(winsorize(li, ["l_returnflag"], "price"))
    assert "BroadcastHashJoin" in plan, plan


def test_session_stats_single_user_exchange(spark, sf_dir):
    """sessionize + session_stats must plan exactly ONE exchange
    (hashpartitioning on the user key): the rollup's grouping keys
    contain the window's partitioning, so EnsureRequirements adds no
    second shuffle."""
    from etl_deltalake_spark.operators.behavior import session_stats
    from etl_deltalake_spark.plans.inspect import plan_string

    ev = load_table(spark, "events", sf_dir)
    df = session_stats(ev, "user_id", "ts", 1800, ["event_id"])
    df.count()
    plan = plan_string(df)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1, plan
    assert "user_id" in exchanges[0], exchanges[0]
