"""10–100x relational scale smoke: the core join/agg family on a
consistently-rekeyed replicated TPC-H-ish dataset.

customer/orders/lineitem are replicated R times with ALL foreign keys
rekeyed consistently (``key*R + k``), so every join still matches
exactly within a replica; dimension tables (nation/region/supplier/
part) stay fixed, as dimensions do at real scale. This scales the FACT
side the way a real warehouse grows — more customers and orders against
the same dimensions — and measures the representative shapes:

- `pricing_summary`    scan + wide groupBy agg (lineitem only)
- `shipping_priority`  3-way join + agg + top-k
- `region_revenue`     5-way star join (broadcast dims)
- `top_orders_per_customer`  per-key ranking window
- `volume_shipping`    disjunctive nation-pair 5-way join

Usage: python scripts/scale_smoke_tpch.py [R] [op ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402

from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"

OPS = [
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "top_orders_per_customer",
    "volume_shipping",
]


def _replicate(df: DataFrame, r: int, rekey: dict[str, str]) -> DataFrame:
    rep = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
    )
    cols = []
    for c in df.columns:
        if c in rekey:
            cols.append((F.col(c) * r + F.col("__k")).alias(c))
        else:
            cols.append(F.col(c))
    return rep.select(*cols)


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ops = sys.argv[2:] or OPS
    spark = get_session(
        app_name=f"scale_smoke_tpch_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    reps = {
        "customer": _replicate(
            table(spark, SF_DIR, "customer"), r, {"c_custkey": 1}
        ),
        "orders": _replicate(
            table(spark, SF_DIR, "orders"), r, {"o_orderkey": 1, "o_custkey": 1}
        ),
        "lineitem": _replicate(
            table(spark, SF_DIR, "lineitem"), r, {"l_orderkey": 1}
        ),
    }
    # Materialize replicas to parquet and read back — for TWO reasons
    # found the hard way: (1) the explode inherits the tiny base-file
    # partition count (60M rows in 8 partitions = 8 busy cores), and
    # (2) localCheckpoint PRESERVES the logical plan's size estimate,
    # which for an explode is the PRE-explosion size — Catalyst then
    # happily broadcast a 60M-row "small" lineitem (BuildLeft BHJ, >8 min
    # at 100×). Reading real files gives real sizes, like production.
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tpch_smoke_")
    for name, df in reps.items():
        df.repartition(64).write.mode("overwrite").parquet(f"{tmp}/{name}")
        reps[name] = spark.read.parquet(f"{tmp}/{name}")
    sizes = {n: reps[n].count() for n in reps}
    print(json.dumps({"replication": r, **sizes}), flush=True)

    import big_data_occupancy_detection_spark.plans.relational as REL
    import big_data_occupancy_detection_spark.plans.tpch_extra as TPX

    for mod in (REL, TPX):
        orig = mod.table
        mod.table = (
            lambda s, d, name, _o=orig: reps[name]
            if name in reps
            else _o(s, d, name)
        )
    from big_data_occupancy_detection_spark.plans import REGISTRY

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
    spark.stop()


if __name__ == "__main__":
    main()
