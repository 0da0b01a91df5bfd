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

# Every Exchange flavor counts as a shuffle: hashpartitioning (join/agg),
# rangepartitioning (sort / repartitionByRange / z-order / global
# numbering), SinglePartition (global agg / limit funnel), and
# rebalance/REPARTITION forms (AQE rebalance). Counting only hash
# exchanges would let a code change smuggle in a global sort unseen.
_EXCHANGE_RE = re.compile(
    r"Exchange (hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning|rebalance)"
)


def plan_metrics(df: DataFrame) -> dict:
    """{exchanges, exchange_kinds: {kind: n}, joins: {kind: n},
    pushed_filter_scans, cartesian} — exchanges is the total across ALL
    partitioning flavors; exchange_kinds is the per-kind breakdown."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins: dict[str, int] = {}
    for j in _JOIN_RE.findall(plan):
        joins[j] = joins.get(j, 0) + 1
    kinds: dict[str, int] = {}
    for k in _EXCHANGE_RE.findall(plan):
        kinds[k] = kinds.get(k, 0) + 1
    return {
        "exchanges": sum(kinds.values()),
        "exchange_kinds": dict(sorted(kinds.items())),
        "joins": dict(sorted(joins.items())),
        "pushed_filter_scans": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "cartesian": "CartesianProduct" in joins,
    }
