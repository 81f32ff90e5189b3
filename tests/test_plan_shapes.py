"""Executed-plan assertions across the WHOLE registry: no registered
query may plan a quadratic join (BroadcastNestedLoopJoin /
CartesianProduct) — the round-1 verdict's scale gate. The exact
all-pairs baselines (cosine_near_dup_pairs, pairwise_knn) are
deliberately unregistered; the wired plans are the blocked/bucketed
variants."""

from __future__ import annotations

import re

from etl_deltalake_spark.plans.inspect import plan_report, plan_string
from etl_deltalake_spark.plans.registry import all_queries, retired_queries

_FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")


def _physical_plan(df) -> str:
    return plan_string(df)


# Queries whose one BNLJ is a SINGLE-ROW broadcast cross join (a
# scalar aggregate folded into the plan — O(n), not all-pairs):
# q_lm_score crossJoins the 1-row vocab-size aggregate; q_bm25
# crossJoins the 1-row (N, avgdl) corpus-constants aggregate.
_SCALAR_CROSS_OK = {
    "q_lm_score": 1,
    "q_bm25": 1,
    "q_standardize": 1,
    # (q_ivfpq_topk, q_incr_semdedup, q_ann_recall and
    # q_ivf_recall_curve lost their codebook-broadcast BNLJ in the
    # round-14 assignment rewrite: ivf_assign_df computes the raw
    # measures in an Arrow kernel and takes the winner cid from a
    # literal array, so no constant-key join exists to fold — their
    # expected count is now the default 0)
    # heavy_hitters crossJoins the 1-row total-count aggregate for
    # the integer threshold test (stats.heavy_hitters)
    "q_heavy_hitters": 1,
    # corpus_divergence crossJoins the 1-row (N_a, N_b, |V|) totals
    "q_corpus_kl": 1,
    # Q22 broadcasts the 1-row positive-balance (sum, count)
    # threshold aggregate
    "q_tpch_q22": 1,
    # lm transfer crossJoins the 1-row train-vocabulary size
    "q_lm_transfer": 1,
    # (q_tpch_q15's round-9 1-row max broadcast needs NO entry:
    # Catalyst pushes the total_revenue = _mx filter into the join
    # condition, planning a BroadcastHashJoin, not a BNLJ)
    # psi drift crossJoins the 1-row (t_ref, t_cur) totals aggregate
    "q_psi_drift": 1,
    # rfm crossJoins the single 1-row quintile-boundary aggregate
    # (round-9 boundary scoring; the corpus-max join is gone —
    # recency scores on last_epoch directly)
    "q_rfm": 1,
    # round 9: NB classifier — the CHECKPOINTED 1-row totals
    # broadcasts onto the model terms, and the 1-row consts
    # projection broadcasts onto the scored tokens (the totals'
    # internal cross join materialized away with the checkpoint)
    "q_quality_clf": 2,
    # (q_semantic_dedup needs NO entry since the round-9 assignment
    # checkpoint: the codebook-broadcast argmax runs pre-checkpoint,
    # so the final plan self-joins a materialized scan — 0 BNLJ)
    # round 10: the derived partsupp crossJoins the 1-row supplier
    # COUNT (its 4-way fanout is an explode, not a join). Q2 and Q11
    # consume partsupp through two branches of a self-join/agg pair,
    # so the 1-row broadcast appears once per branch; Q11 adds the
    # 1-row (total, np) threshold aggregate (the q_psi_drift
    # pattern).
    "q_tpch_q2": 2,
    "q_tpch_q9": 1,
    "q_tpch_q11": 3,
    "q_tpch_q16": 1,
    "q_tpch_q20": 1,
}


def test_no_quadratic_join_in_any_query(spark, sf_dir):
    """Registered AND retired/slotless: the whole query surface must
    plan equi-joins, never all-pairs (plans/inspect.plan_report).
    Single-row scalar cross joins are allowlisted by name with their
    exact expected count — anything beyond fails."""
    offenders: dict[str, dict] = {}
    everything = {**all_queries(), **retired_queries()}
    for name, fn in sorted(everything.items()):
        report = plan_report(fn(spark, sf_dir))
        if (
            report["bnlj"] != _SCALAR_CROSS_OK.get(name, 0)
            or report["cartesian"]
        ):
            offenders[name] = {
                "bnlj": report["bnlj"], "cartesian": report["cartesian"]
            }
    assert not offenders, f"quadratic join nodes in plans: {offenders}"


def test_bucketed_join_agg_has_no_exchange(spark, sf_dir):
    """The q_bucketed_join_agg plan must be shuffle-FREE end to end:
    bucketed scans feed the SortMergeJoin and the aggregation reuses
    its partitioning (the 100 TB shuffle-amortization pattern)."""
    from etl_deltalake_spark.plans.queries import q_bucketed_join_agg

    df = q_bucketed_join_agg(spark, sf_dir)
    df.count()
    plan = _physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert not re.search(r"Exchange", plan), plan


def test_pack_sequences_shuffles_counts_not_text(spark, sf_dir):
    """Sequence packing's window shuffle must carry only
    (doc, shard, n_tokens) — tokenization collapses to a count BEFORE
    the exchange, so the text column never shuffles."""
    from etl_deltalake_spark.operators.packing import pack_sequences
    from etl_deltalake_spark.operators.text import token_count
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    df = pack_sequences(docs, "doc_id", token_count("text"), budget=512)
    plan = _physical_plan(df)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(shard" in exchanges[0], exchanges[0]
    assert "text" not in exchanges[0], exchanges[0]


def test_fuzzy_pairs_plan_is_hash_join(spark, sf_dir):
    """Blocked fuzzy matching must candidate-generate via an
    equi-join (hash/sort-merge), never a nested-loop product."""
    from etl_deltalake_spark.plans.queries import q_fuzzy_pairs

    plan = _physical_plan(q_fuzzy_pairs(spark, sf_dir))
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan), plan
    for node in _FORBIDDEN:
        assert node not in plan, plan


def test_substring_dup_shuffles_hashes_not_text(spark, sf_dir):
    """Every exchange in the substring-dup plan must carry positioned
    gram HASHES (or doc/pos keys) — never the text column or the
    words array (the raw-text-never-moves contract)."""
    from etl_deltalake_spark.operators.dedup import substring_dup_stats
    from etl_deltalake_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    df = substring_dup_stats(docs, "doc_id", "text", k=5)
    df.count()
    plan = _physical_plan(df)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchanges, plan
    for ln in exchanges:
        assert "text" not in ln and "words" not in ln, ln


def test_rfm_plan_has_no_window(spark, sf_dir):
    """q_rfm's quintile scoring must plan ZERO Window nodes (round 9
    — replaces round 8's three partition-less global ntile sorts):
    boundaries come from one exact percentile aggregate, scoring is
    broadcast CASE arithmetic."""
    from etl_deltalake_spark.plans.queries_ext import q_rfm

    plan = _physical_plan(q_rfm(spark, sf_dir))
    assert "Window" not in plan, plan


def test_tpch_q15_plan_has_no_window(spark, sf_dir):
    """q_tpch_q15's max-revenue selection must plan ZERO Window nodes
    (round 9 — the rank form funneled the supplier-sized revenue
    table through one task); the max is a 1-row broadcast."""
    from etl_deltalake_spark.plans.queries_ext import q_tpch_q15

    plan = _physical_plan(q_tpch_q15(spark, sf_dir))
    assert "Window" not in plan, plan


def test_tpch_q21_plan_has_no_expand(spark, sf_dir):
    """Q21's per-order decorrelation must plan the two-level
    distinct-free aggregate (round 9): a double countDistinct would
    put an Expand node (2x row multiplication) on the lineitem
    shuffle — pinned absent."""
    from etl_deltalake_spark.plans.queries_ext import q_tpch_q21

    plan = _physical_plan(q_tpch_q21(spark, sf_dir))
    assert "Expand" not in plan, plan


def test_tpch_q9_fact_shuffles_once(spark, sf_dir):
    """Q9's scale contract (round 10): the name-filtered part ⋈
    derived-partsupp composite BROADCASTS into the lineitem scan and
    every dimension hop is a broadcast — the only shuffle exchanges
    left belong to lineitem ⋈ orders and the final aggregate, so the
    fact table crosses the network at most twice and never for a
    dimension."""
    from etl_deltalake_spark.plans.queries_ext import q_tpch_q9

    df = q_tpch_q9(spark, sf_dir)
    df.count()
    report = plan_report(df)
    assert report["exchanges"] <= 2, report
    assert report["sort_merge_joins"] == 0, report
    assert report["cartesian"] == 0, report


def test_partsupp_derivation_is_shuffle_free(spark, sf_dir):
    """The derived partsupp must be a narrow map over the part scan:
    one 1-row broadcast (the supplier count) + a Generate (explode)
    fanout, ZERO shuffle exchanges — at 100 TB it costs exactly one
    pass over part."""
    from etl_deltalake_spark.plans.queries_ext import _partsupp

    df = _partsupp(spark, sf_dir)
    df.count()
    report = plan_report(df)
    assert report["exchanges"] == 0, report
    plan = _physical_plan(df)
    assert "Generate" in plan, plan
