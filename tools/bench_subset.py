"""Larger-SF evidence bench (round-10 VERDICT item 2): time a SUBSET of
registry queries with bench.py's exact methodology (noop sink, best-of-N,
get_session on local[$SPARK_GRAFT_CPUS], warmed page cache + worker pool)
at an arbitrary data dir — the sf0.1 suite is overhead-bound (8-core
total ~= 32-core total), so plan-shape wins need a scale where compute
dominates. bench.py itself is untouched: its contract (queries, timing,
JSON line) stays byte-comparable across rounds.

Usage: python tools/bench_subset.py <sf_dir> <name1,name2,...>
Env:   SPARK_GRAFT_CPUS (core count), SPARK_GRAFT_BENCH_RUNS (default 2)

Prints ONE JSON line {"metric", "value", "unit", "queries", "sf_dir",
"cpus"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_occupancy_detection_spark.plans import REGISTRY
from big_data_occupancy_detection_spark.session import cpu_count, get_session


def main() -> None:
    sf_dir = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown query name(s): {unknown}")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_session(
        app_name="bdo-spark-bench-subset",
        master=f"local[{cpu_count()}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    from big_data_occupancy_detection_spark.sources.readers import (
        TABLE_NAMES,
        table,
    )

    for t in TABLE_NAMES:
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(max(n_runs, 1)):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "metric": "subset wall time (noop sink, local)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf_dir": sf_dir,
                "cpus": cpu_count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
