#!/usr/bin/env python
"""Regenerate BENCH/PLAN_AUDIT.md's per-query plan table from live
``explain`` output at sf0.001 (one row per driver-gated query).

Run from the repo root:  python BENCH/gen_plan_audit.py
Rewrites only the table block; the prose around it is kept by hand.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
AUDIT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLAN_AUDIT.md")


def plan_row(plan: str) -> tuple[int, int, int, int, int]:
    exchanges = sum(
        plan.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    arrow = (
        plan.count("MapInArrow")
        + plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapGroupsInPandas")
    )
    return exchanges, bhj, smj, codegen, arrow


def main() -> None:
    from tests.conftest import make_spark

    import __spark_entry__ as E

    spark = make_spark("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    lines = []
    for name, fn in sorted(E.queries().items()):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        e, b, s, c, a = plan_row(plan)
        lines.append(f"| {name} | {e} | {b} | {s} | {c} | {a} |")
    spark.stop()

    text = open(AUDIT).read()
    head = "| query | exchanges | BHJ | SMJ | codegen spans | arrow stages |"
    sep = "|---|---|---|---|---|---|"
    start = text.index(head)
    # table ends at the first blank line after the header
    end = text.index("\n\n", start)
    new_table = "\n".join([head, sep, *lines])
    open(AUDIT, "w").write(text[:start] + new_table + text[end:])
    print(f"wrote {len(lines)} rows")


if __name__ == "__main__":
    main()
