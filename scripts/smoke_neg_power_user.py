"""Power-user cliff smoke for negative sampling (round-7, r6 verdict
"what's wrong #2").

Corpus: 1,000 normal users x 30 items + ONE power user with N items
(catalog 100k). The pure array form pays O(K*|items|^2) inside that one
user's row — a single-task cliff invisible to oracle gates (TPC-H users
hold ~30 items). The hybrid routes the power user through the row-stream
anti-join branch: O(K*|items|) rows hash-partitioned across the cluster.

Usage: python scripts/smoke_neg_power_user.py [power_items] [mode]
  mode: hybrid (default threshold) | array (threshold=10**9) | both
Prints one wall-time line per mode.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from big_data_occupancy_detection_spark.plans.mlplans import (  # noqa: E402
    negative_samples_by_user,
)

POWER_ITEMS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "both"
CATALOG = 100_000

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

normal = (
    spark.range(30_000)
    .select(
        (F.col("id") % 1000 + 10).cast("long").alias("user_id"),
        F.pmod(F.xxhash64("id"), F.lit(CATALOG)).cast("long").alias("item"),
    )
)
power = spark.range(1, POWER_ITEMS + 1).select(
    F.lit(7).cast("long").alias("user_id"), F.col("id").alias("item")
)
pairs = normal.unionByName(power).localCheckpoint(eager=True)
np_ = spark.range(1).select(F.lit(CATALOG).cast("long").alias("n"))

runs = {"hybrid": None, "array": 10**9}
for mode, thr in runs.items():
    if MODE not in ("both", mode):
        continue
    t0 = time.time()
    out = (
        negative_samples_by_user(pairs, np_)
        if thr is None
        else negative_samples_by_user(pairs, np_, power_user_threshold=thr)
    )
    n = out.select(F.sum(F.size("kept_negs"))).first()[0]
    print(
        f"mode={mode} power_items={POWER_ITEMS} kept_total={n} "
        f"wall={time.time() - t0:.1f}s",
        flush=True,
    )
