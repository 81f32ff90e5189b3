"""Structured physical-plan inspection: the programmatic form of the
``.explain("formatted")`` audit this repo's SCALE.md does by hand.

An engine that claims "no BNLJ in registered plans" or "this join is
shuffle-free" should be able to ASSERT it; tests previously grepped
raw plan strings ad hoc (tests/test_partitioning.py,
test_plan_shapes.py) — this centralizes the parsing so plan
regressions fail with a named counter instead of a string miss.

Driver-side only, metadata-sized: reads the executed plan string,
never touches data.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    # an EXECUTED AQE plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — keep only what actually ran, or every
    # counter double-counts
    if "== Initial Plan ==" in s:
        s = s.split("== Initial Plan ==")[0]
    return s


def plan_report(df: DataFrame) -> dict:
    """Counters over the executed physical plan:

      exchanges          shuffle boundaries (Exchange hashpartitioning/
                         rangepartitioning; AQE may collapse later)
      broadcasts         BroadcastExchange nodes (broadcast joins)
      bnlj               BroadcastNestedLoopJoin nodes (all-pairs —
                         should be 0 in every scale-path plan)
      cartesian          CartesianProduct nodes (ditto)
      sort_merge_joins   SortMergeJoin nodes
      hash_joins         BroadcastHashJoin + ShuffledHashJoin nodes
      codegen_spans      WholeStageCodegen regions (wider = more of
                         the plan fused into JVM loops)
      scans              parquet/file scan nodes
      pushed_filters     scan-level PushedFilters entries (non-empty
                         lists only — evidence predicate pushdown
                         reached the reader)
    """
    plan = plan_string(df)
    pushed = [
        m
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.strip()
    ]
    return {
        "exchanges": len(re.findall(r"\bExchange (?:hash|range)partitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "hash_joins": plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin"),
        # Spark's toString renders whole-stage-codegen regions as
        # "*(N) Operator" prefixes (the formatted explain spells out
        # "WholeStageCodegen (N)" instead) — count distinct stage ids
        "codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
        ),
        "scans": len(re.findall(r"FileScan|Scan parquet", plan)),
        "pushed_filters": pushed,
    }


def assert_scale_safe(df: DataFrame) -> dict:
    """Raise AssertionError if the plan contains an all-pairs join
    (BNLJ / CartesianProduct); returns the report otherwise. The
    one-line guard an operator test adds to lock in its shape."""
    report = plan_report(df)
    if report["bnlj"] or report["cartesian"]:
        raise AssertionError(
            f"all-pairs join in plan (bnlj={report['bnlj']}, "
            f"cartesian={report['cartesian']}):\n{plan_string(df)}"
        )
    return report


def _jvm_children(node):
    """Children of a JVM SparkPlan node, descending through the
    wrappers that hide subtrees from a naive ``children()`` walk:
    AQE roots expose the final plan via ``executedPlan()``,
    materialized query stages via ``plan()``, reused exchanges via
    ``child()``."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return [node.executedPlan()]
    if name.endswith("QueryStageExec"):
        return [node.plan()]
    if name == "ReusedExchangeExec":
        return [node.child()]
    cs = node.children()
    return [cs.apply(i) for i in range(cs.size())]


_JOIN_NODES = frozenset(
    (
        "SortMergeJoinExec",
        "BroadcastHashJoinExec",
        "ShuffledHashJoinExec",
        "BroadcastNestedLoopJoinExec",
        "CartesianProductExec",
    )
)


def bucketed_scan_exchange_audit(df: DataFrame) -> dict:
    """Walk the EXECUTED plan tree and report, for every bucketed
    file scan, whether an Exchange sits BETWEEN the scan and its
    nearest enclosing join — i.e. whether the bucketed side actually
    enters the join co-located or gets re-shuffled anyway.

    This is the tree property a substring match
    (``"SelectedBucketsCount" in plan``) cannot express: round 5
    shipped a bucketing whose scan carried the bucket spec yet was
    STILL shuffled (bucket keys ⊂ join keys → not co-partitioned
    under requireAllClusterKeysForCoPartition). Exchanges ABOVE the
    join are legitimate (post-join aggregations re-key) and are not
    counted; a bucketed scan with NO enclosing join at all is never
    flagged either (round 8) — an Exchange over a join-less bucketed
    scan (e.g. a groupBy re-keying on a non-bucket column) says
    nothing about join co-location, which is the only claim this
    audit grades. Run an action on ``df`` first so AQE has finalized
    the plan.

    Returns {"bucketed_scans": n, "shuffled_bucketed_scans": n}.
    """
    found = {"bucketed_scans": 0, "shuffled_bucketed_scans": 0}

    def walk(node, exchange_below_join: bool, in_join: bool) -> None:
        name = node.getClass().getSimpleName()
        if name in _JOIN_NODES:
            exchange_below_join = False  # reset at each join boundary
            in_join = True
        elif "Exchange" in name:
            exchange_below_join = True
        if name == "FileSourceScanExec" and "SelectedBucketsCount" in node.toString():
            found["bucketed_scans"] += 1
            if in_join and exchange_below_join:
                found["shuffled_bucketed_scans"] += 1
        for child in _jvm_children(node):
            walk(child, exchange_below_join, in_join)

    walk(df._jdf.queryExecution().executedPlan(), False, False)
    return found


def executed_metrics(df: DataFrame) -> dict:
    """Runtime SQLMetrics harvest (round 8) — the dynamic complement
    of the static plan audits above: AFTER an action has run, walk
    the executed plan (through the AQE/query-stage wrappers) and
    collect every node's metric values, plus the totals an operator
    review actually asks about:

      scan_rows / scan_files   what the scans really read (pushdown
                               and pruning measured, not inferred)
      shuffle_records_written  what really crossed the wire
      spill_bytes              whether anything fell out of memory

    Call on the SAME DataFrame after .collect()/.count() — a fresh
    DataFrame has empty metrics. This is "measure, don't guess" as a
    library call: plan_report proves a shuffle EXISTS, this weighs
    it.
    """
    nodes: list[tuple[str, dict]] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        vals: dict = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        if vals:
            nodes.append((name, vals))
        for c in _jvm_children(node):
            walk(c)

    walk(df._jdf.queryExecution().executedPlan())

    def total(key: str, node_suffix: str | None = None) -> int:
        return sum(
            v.get(key, 0)
            for n, v in nodes
            if node_suffix is None or n.endswith(node_suffix)
        )

    return {
        "nodes": nodes,
        "scan_rows": total("numOutputRows", "ScanExec"),
        "scan_files": total("numFiles"),
        "shuffle_records_written": total("shuffleRecordsWritten"),
        "spill_bytes": total("spillSize"),
    }
