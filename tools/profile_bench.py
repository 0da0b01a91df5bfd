"""Per-query execution profile over the bench HEADLINE set: jobs,
stages, tasks, shuffle bytes — via StatusTracker deltas around each
noop-sink execution. Ranks queries by serial-job count and shuffle
volume; the round-10 optimization map.

Usage: python tools/profile_bench.py [sf_dir] [name1,name2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_occupancy_detection_spark.plans import REGISTRY
from big_data_occupancy_detection_spark.session import cpu_count, get_session


def headline_names() -> list[str]:
    import re

    src = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    ).read()
    block = re.search(r"HEADLINE = \[(.*?)\]", src, re.S).group(1)
    return [
        line.strip().split('"')[1]
        for line in block.splitlines()
        if line.strip().startswith('"')
    ]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        [n for n in sys.argv[2].split(",") if n]
        if len(sys.argv) > 2
        else headline_names()
    )
    spark = get_session(
        app_name="profile-bench",
        master=f"local[{cpu_count()}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    from big_data_occupancy_detection_spark.sources.readers import TABLE_NAMES, table

    for t in TABLE_NAMES:
        table(spark, sf, t).write.format("noop").mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def snap():
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(None)
        return set(jobs)

    out = []
    for name in names:
        sc.setJobDescription(name)
        before_jobs = jsc.dagScheduler().nextJobId()
        before_stage = jsc.dagScheduler().nextStageId()
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        n_jobs = jsc.dagScheduler().nextJobId() - before_jobs
        n_stages = jsc.dagScheduler().nextStageId() - before_stage
        out.append(
            {
                "name": name,
                "wall": round(wall, 3),
                "jobs": n_jobs,
                "stages": n_stages,
            }
        )
        print(
            f"{name:38s} {wall:7.3f}s  jobs={n_jobs:3d} stages={n_stages:3d}"
        )
    out.sort(key=lambda r: -r["wall"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
