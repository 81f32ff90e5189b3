"""Generate PLANS.md: the physical-plan shape inventory for every
driver-registered query — the machine-written counterpart of
SCALE.md's hand audits, regenerated per round so the numbers can't
drift from the code.

Usage: python tools/gen_plans_md.py [sf_dir]   (default sf0.001)

For each registered query the table records shuffle boundaries,
broadcast exchanges, join kinds, whole-stage-codegen spans, scans and
whether predicate pushdown reached a reader. Quadratic-join counters
(BNLJ/cartesian) are omitted from the table because
tests/test_plan_shapes.py already enforces them exactly (zero beyond
the named 1-row scalar allowlist).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from etl_deltalake_spark.plans.inspect import plan_report
    from etl_deltalake_spark.plans.registry import all_queries
    from etl_deltalake_spark.session import get_spark

    spark = get_spark("gen-plans-md")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        # collect() executes THIS dataframe's own query execution and
        # finalizes AQE (a count() plans a SEPARATE execution and
        # leaves the df's plan unfinalized, hiding codegen
        # annotations); fixture-scale results are driver-safe
        df.collect()
        r = plan_report(df)
        rows.append(
            (
                name,
                r["exchanges"],
                r["broadcasts"],
                r["sort_merge_joins"],
                r["hash_joins"],
                r["codegen_spans"],
                r["scans"],
                "yes" if r["pushed_filters"] else "",
            )
        )

    lines = [
        "# PLANS — physical-plan shape inventory (generated)",
        "",
        f"One row per driver-registered query at `{sf_dir}`, produced by",
        "`python tools/gen_plans_md.py` from the EXECUTED physical plan",
        "(post-AQE — runtime-coalesced exchanges and codegen regions are",
        "what actually ran).",
        "Counters from plans/inspect.plan_report. Quadratic joins are",
        "enforced at zero (beyond the named 1-row scalar allowlist) by",
        "tests/test_plan_shapes.py and therefore not tabulated.",
        "",
        "| query | shuffles | broadcasts | SMJ | hash joins | codegen spans"
        " | scans | pushdown |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for row in rows:
        lines.append("| " + " | ".join(str(x) for x in row) + " |")

    totals = [sum(r[i] for r in rows) for i in range(1, 7)]
    lines += [
        "",
        f"Totals over {len(rows)} queries: {totals[0]} shuffles, "
        f"{totals[1]} broadcasts, {totals[2]} sort-merge joins, "
        f"{totals[3]} hash joins, {totals[4]} codegen spans, "
        f"{totals[5]} scans.",
        "",
    ]
    Path(REPO, "PLANS.md").write_text("\n".join(lines))
    print(f"PLANS.md written ({len(rows)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
