"""Plan auditor: dump join strategies, exchanges, pushdowns, and codegen
spans for every registered query — the physical-plan regression check.

Usage:
    python tools/explain_audit.py [sf_dir]        # summary table
    python tools/explain_audit.py sf_dir NAME     # full formatted plan

Red flags to grep for in the output: CartesianProduct or
BroadcastNestedLoopJoin on large inputs, `PushedFilters: []` on a filtered
scan, exchange counts that grew since the last audit.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_occupancy_detection_spark.plans import REGISTRY
from big_data_occupancy_detection_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_session(app_name="explain-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    names = [only] if only else sorted(REGISTRY)
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only or env-gated entries
            print(f"{name:32s}  SKIP ({type(e).__name__})")
            continue
        if only:
            print(plan)
            break
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)",
            plan,
        )
        n_exch = plan.count("Exchange hashpartitioning")
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        flags = ""
        if "CartesianProduct" in joins:
            flags += " !CARTESIAN"
        if "BroadcastNestedLoopJoin" in joins:
            # deliberate broadcast crossJoins (tiny query side vs corpus)
            # also surface as BNLJ — only a red flag when BOTH sides are big
            flags += " BNLJ(check-broadcast-side)"
        print(
            f"{name:32s} joins={len(joins):d} "
            f"({','.join(sorted(set(j[0] for j in joins))) or '-'}) "
            f"exch={n_exch} pushed={pushed}{flags}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
