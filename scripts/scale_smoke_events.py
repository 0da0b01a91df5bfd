"""100x window/sessionization scale smoke (union-replicated events).

Replicates sf0.1 ``events`` R times with rekeyed event ids, KEEPING
user ids — so per-user event counts grow R-fold, which is exactly the
stress for the per-user window family (sessionization, running
aggregates, gap fill): partition-local sort volume scales with the
hottest key, not the corpus. Replica timestamps are jittered ±30 min
(deterministic, per replica) so sessions/windows don't degenerate into
pure duplicates.

Measured ops: lag-window sessionization, native session_window agg,
two-sided window gap fill, sliding windows, ignore-nulls attribution.

Usage: python scripts/scale_smoke_events.py [R] [op ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402

from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"

OPS = {
    "sessions": "user_sessions",
    "session_windows": "user_session_windows",
    "interp": "events_interp_daily",
    "sliding": "sliding_hour_activity",
    "attribution": "attribution_last_touch",
    "bitmaps": "user_day_bitmaps",
    "lateness": "event_lateness_profile",
    "anomalies": "events_hourly_anomalies",
    "cusum": "user_value_cusum",
    "asof_nearest": "nearest_error_to_purchase",
    "asof_fwd": "next_purchase_asof_events",
    "training_pairs": "next_event_training_pairs",
    "pit_features": "user_features_point_in_time",
    "attribution_decay": "attribution_time_decay",
    "sliding_distinct": "sliding_distinct_users",
    "kmv_retention": "kmv_day_retention",
}


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or list(OPS)
    spark = get_session(
        app_name=f"scale_smoke_events_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    ev = table(spark, SF_DIR, "events")
    rep = (
        ev.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
        )
        .select(
            (F.col("event_id") * r + F.col("__k")).alias("event_id"),
            (
                F.col("ts")
                + F.make_interval(
                    secs=(
                        F.pmod(
                            F.xxhash64(F.col("event_id") * r + F.col("__k")),
                            F.lit(3600),
                        )
                        - 1800
                    ).cast("double")
                )
            ).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .localCheckpoint(eager=True)
    )
    print(json.dumps({"replication": r, "rows": rep.count()}), flush=True)

    # kmv's stress axis is DISTINCT USERS (sketch input cardinality), not
    # per-user density: rekey user_id too for that op so day-grain
    # distincts grow r-fold
    rep_users = rep.withColumn(
        "user_id",
        F.col("user_id") * r + F.pmod(F.col("event_id"), F.lit(r)),
    ).localCheckpoint(eager=True) if any(
        OPS[o] == "kmv_day_retention" for o in ops
    ) else None

    from big_data_occupancy_detection_spark.plans import events as EV
    from big_data_occupancy_detection_spark.plans import analytics as AN
    from big_data_occupancy_detection_spark.plans import temporal as TP
    from big_data_occupancy_detection_spark.plans import warehouse as WH

    for mod in (EV, AN, TP, WH):
        orig = mod.table
        mod.table = (
            lambda s, d, name, _o=orig: rep if name == "events" else _o(s, d, name)
        )
    from big_data_occupancy_detection_spark.plans import REGISTRY

    try:
        for op in ops:
            name = OPS[op]
            cur = rep_users if name == "kmv_day_retention" else rep
            for mod in (EV, AN, TP, WH):
                orig0 = getattr(mod, "__orig_table", None) or mod.table
                mod.__orig_table = orig0
            for mod in (EV, AN, TP, WH):
                mod.table = (
                    lambda s, d, name2, _o=mod.__orig_table, _c=cur:
                        _c if name2 == "events" else _o(s, d, name2)
                )
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
        spark.stop()


if __name__ == "__main__":
    main()
