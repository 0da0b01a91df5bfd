"""10-100x BI scale smoke: segmentation / Pareto / basket operators on a
consistently-rekeyed replicated fact side (PERF.md).

customer/orders/lineitem replicate R times with foreign keys rekeyed
(``key*R + k``) exactly like scale_smoke_tpch.py — the CUSTOMER and
ORDER grains grow R-fold (the stress for the entity-grain global
quartile/cumulative forms that round 3 flagged as single-task windows),
while parts stay fixed so co-purchase support densifies the way a real
catalog does. Replicas are materialized to parquet (real sizes, real
partition counts — see the localCheckpoint size-estimate trap note in
scale_smoke_tpch.py).

Measured ops: customer_rfm_segments (stacked global_row_number + exact
ntile quotas), part_abc_classes (global_cumsum + integer-cents Pareto
thresholds), part_copurchase_lift (guarded per-order pair fan-out),
order_interarrival_stats (per-customer lag + percentile profile).

Usage: python scripts/scale_smoke_bi.py [R] [op ...]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402

from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"

OPS = [
    "customer_rfm_segments",
    "part_abc_classes",
    "part_copurchase_lift",
    "order_interarrival_stats",
    "copurchase_bfs_depths",
    "part_negative_samples",
    "lineitem_weighted_price_percentiles",
    "orders_benford_digits",
    "brand_weighted_median_price",
    "customer_k_anonymity",
    "customer_l_diversity",
    "recsys_training_examples",
    "priority_revenue_holt",
    "priority_revenue_trend_test",
    # round 7
    "priority_revenue_cusum",
    "priority_dow_seasonality",
    "nation_spend_gini",
    "customer_order_gaps",
    "copurchase_kcore",
    # round 7 late additions (orders-grain)
    "priority_theilsen_slope",
    "order_price_ks_drift",
    "flag_spearman_qty_price",
    "brand_association_rules",
]


def _replicate(df: DataFrame, r: int, rekey: set[str]) -> DataFrame:
    rep = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
    )
    return rep.select(
        *[
            (F.col(c) * r + F.col("__k")).alias(c) if c in rekey else F.col(c)
            for c in df.columns
        ]
    )


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or OPS
    spark = get_session(
        app_name=f"scale_smoke_bi_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    reps = {
        "customer": _replicate(table(spark, SF_DIR, "customer"), r, {"c_custkey"}),
        "orders": _replicate(
            table(spark, SF_DIR, "orders"), r, {"o_orderkey", "o_custkey"}
        ),
        "lineitem": _replicate(table(spark, SF_DIR, "lineitem"), r, {"l_orderkey"}),
    }
    tmp = tempfile.mkdtemp(prefix="bi_smoke_")
    for name, df in reps.items():
        df.repartition(64).write.mode("overwrite").parquet(f"{tmp}/{name}")
        reps[name] = spark.read.parquet(f"{tmp}/{name}")
    sizes = {n: reps[n].count() for n in reps}
    print(json.dumps({"replication": r, **sizes}), flush=True)

    import big_data_occupancy_detection_spark.plans.bi as BI
    import big_data_occupancy_detection_spark.plans.curation as CU
    import big_data_occupancy_detection_spark.plans.mlplans as ML
    import big_data_occupancy_detection_spark.plans.warehouse as WH

    orig = BI.table
    for mod in (BI, WH, ML, CU):
        mod.table = (
            lambda s, d, name, _o=orig: reps.get(name) or _o(s, d, name)
        )
    from big_data_occupancy_detection_spark.plans import REGISTRY

    try:
        for name in ops:
            r0, w0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            r1, w1 = shuffle_totals(spark)
            print(
                json.dumps(
                    {
                        "op": name,
                        "wall_s": round(wall, 2),
                        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                    }
                ),
                flush=True,
            )
    finally:
        BI.table = orig
        WH.table = orig
        ML.table = orig
        CU.table = orig
    spark.stop()


if __name__ == "__main__":
    main()
