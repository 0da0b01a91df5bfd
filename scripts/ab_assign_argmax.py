"""Within-session A/B: centroid/codeword argmax as ×k fan-out +
groupBy(max_by(struct)) [r9 form, SortAggregate] vs the round-10 map-only
broadcast-array array_max form.

Monkeypatches ext.similarity back to the OLD assignment shapes between
runs, so both forms execute interleaved in ONE session (this host drifts
1.5-2x between sessions — PERF.md). Times registry queries end-to-end
into the noop sink at the given sf dir.

Usage: python scripts/ab_assign_argmax.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from big_data_occupancy_detection_spark.ext import similarity as SIM
from big_data_occupancy_detection_spark.plans import REGISTRY
from big_data_occupancy_detection_spark.session import cpu_count, get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
QUERIES = [
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_cluster_balanced_sample",
    "semantic_dedup_capped",
]

NEW = {
    "_assign_nearest": SIM._assign_nearest,
    "_pq_assign_l2": SIM._pq_assign_l2,
    "_assign_codes": SIM._assign_codes,
}


def _old_assign_nearest(df, cent, id_col, vec_col):
    from big_data_occupancy_detection_spark.functions.vector_fns import dot

    joined = df.crossJoin(F.broadcast(cent)).withColumn(
        "__dot", dot(vec_col, "__cent")
    )
    return joined.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("__dot"), -F.col("cid"))).alias("cluster"),
        F.first(vec_col).alias(vec_col),
    )


def _old_pq_assign_l2(df, cent):
    from big_data_occupancy_detection_spark.functions.vector_fns import dot

    joined = df.crossJoin(F.broadcast(cent)).withColumn(
        "__obj", dot("nvec", "__cent") - 0.5 * dot("__cent", "__cent")
    )
    return joined.groupBy("vid").agg(
        F.max_by("cid", F.struct(F.col("__obj"), -F.col("cid"))).alias("cluster"),
        F.first("nvec").alias("nvec"),
    )


def _old_assign_codes(normed, cents, n_sub, d_sub):
    codes = None
    for s in range(n_sub):
        sub = normed.select(
            "vid", F.slice("nvec", s * d_sub + 1, d_sub).alias("nvec")
        )
        code_s = _old_pq_assign_l2(sub, cents[s]).select(
            F.col("vid").alias("vec_id"), F.col("cluster").alias(f"c{s}")
        )
        codes = code_s if codes is None else codes.join(code_s, "vec_id")
    return codes


OLD = {
    "_assign_nearest": _old_assign_nearest,
    "_pq_assign_l2": _old_pq_assign_l2,
    "_assign_codes": _old_assign_codes,
}


def set_form(form: dict) -> None:
    for k, v in form.items():
        setattr(SIM, k, v)


def main() -> None:
    spark = get_session(
        app_name="ab-assign-argmax",
        master=f"local[{cpu_count()}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm page cache + JVM like bench.py
    from big_data_occupancy_detection_spark.sources.readers import TABLE_NAMES, table

    for t in TABLE_NAMES:
        table(spark, SF, t).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in QUERIES
    }
    for _ in range(RUNS):
        for label, form in (("old", OLD), ("new", NEW)):
            set_form(form)
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"{q} [{label}]")
                t0 = time.perf_counter()
                REGISTRY[q].fn(spark, SF).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[q][label].append(round(time.perf_counter() - t0, 3))
    set_form(NEW)
    summary = {
        q: {
            "old_min": min(v["old"]),
            "new_min": min(v["new"]),
            "old": v["old"],
            "new": v["new"],
        }
        for q, v in out.items()
    }
    print(json.dumps({"sf": SF, "runs": RUNS, "timings": summary}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
