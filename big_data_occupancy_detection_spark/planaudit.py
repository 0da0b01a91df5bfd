"""Physical-plan metrics for plan-regression gating.

``plan_metrics`` reduces a query's executed plan to the numbers that
matter at 100 TB — shuffle (exchange) count, join strategies, pushdown
sites — so a checked-in baseline can FAIL CI when a code change silently
adds a shuffle or flips a broadcast join to sort-merge. Wall-clock
benchmarks catch regressions statistically; plan metrics catch them
deterministically at sf0.001.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def plan_metrics(df: DataFrame) -> dict:
    """{exchanges, joins: {kind: n}, pushed_filter_scans, cartesian}."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins: dict[str, int] = {}
    for j in _JOIN_RE.findall(plan):
        joins[j] = joins.get(j, 0) + 1
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "joins": dict(sorted(joins.items())),
        "pushed_filter_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "cartesian": "CartesianProduct" in joins,
    }
