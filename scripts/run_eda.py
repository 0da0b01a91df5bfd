"""EDA entry point — the engine's equivalent of the reference's
``eda/main.py`` + ``eda/eda_analysis.py`` run: load occupancy-schema CSVs,
merge/dedup/re-key, and print every analysis section (null census,
describe, quantiles, class balance, per-class means, correlations,
hour/day-of-week occupancy rates, threshold queries).

Usage:
    python scripts/run_eda.py <train.csv> [<test.csv> ...]

All sections are single-pass distributed aggregations — unlike the
reference, which re-scanned the CSV once per section
(``eda/eda_analysis.py:176-183``), the merged frame is cached once.
"""

from __future__ import annotations

import os
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.functions.datetime_fns import (
    dow_monday,
    tolerant_timestamp,
)
from big_data_occupancy_detection_spark.operators.relational import (
    describe_stats,
    global_row_number,
    grouped_percentiles,
    null_census,
)
from big_data_occupancy_detection_spark.session import get_local_session
from big_data_occupancy_detection_spark.sources.readers import read_csv_inferred

FEATURES = ["Temperature", "Humidity", "Light", "CO2", "HumidityRatio"]
DEDUP_COLS = ["date", *FEATURES, "Occupancy"]


def load_and_merge(spark, paths: list[str]):
    frames = [
        read_csv_inferred(spark, p).withColumn("set_name", F.lit(os.path.basename(p)))
        for p in paths
    ]
    merged = reduce(lambda a, b: a.unionByName(b), frames)
    merged = (
        merged.withColumn("Occupancy", F.col("Occupancy").cast("int"))
        .withColumn("datetime", tolerant_timestamp("date"))
        .dropDuplicates(DEDUP_COLS)
    )
    return global_row_number(merged, DEDUP_COLS, id_col="id").cache()


def main() -> None:
    paths = sys.argv[1:]
    if not paths:
        sys.exit("usage: run_eda.py <train.csv> [<more.csv> ...]")
    spark = get_local_session("occupancy-eda")
    spark.sparkContext.setLogLevel("ERROR")
    df = load_and_merge(spark, paths)

    print(f"=== merged rows: {df.count()} ===")
    print("--- null census ---")
    null_census(df, FEATURES + ["Occupancy"]).show(truncate=False)
    print("--- describe ---")
    describe_stats(df, FEATURES).show(truncate=False)
    print("--- quantiles (Light) ---")
    grouped_percentiles(
        df.withColumn("all", F.lit(1)), "all", "Light", [0.0, 0.25, 0.5, 0.75, 1.0]
    ).show(truncate=False)
    print("--- class balance ---")
    total = df.count()
    df.groupBy("Occupancy").agg(F.count("*").alias("count")).withColumn(
        "percentage", F.round(F.col("count") * 100.0 / total, 2)
    ).orderBy("Occupancy").show()
    print("--- per-class feature means ---")
    df.groupBy("Occupancy").agg(
        *[F.round(F.avg(c), 3).alias(f"avg_{c}") for c in FEATURES]
    ).orderBy("Occupancy").show(truncate=False)
    print("--- feature↔label correlation ---")
    for c in FEATURES:
        print(f"  {c}: {df.stat.corr(c, 'Occupancy'):+.4f}")
    print("--- occupancy rate by hour ---")
    df.withColumn("hour", F.hour("datetime")).groupBy("hour").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("Occupancy").cast("double")), 4).alias("occ_rate"),
    ).orderBy("hour").show(24)
    print("--- occupancy rate by day-of-week (Mon=1) ---")
    df.withColumn("dow", dow_monday("datetime")).groupBy("dow").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.col("Occupancy").cast("double")), 4).alias("occ_rate"),
    ).orderBy("dow").show()
    print("--- bright-room occupancy (Light > 300) ---")
    df.filter(F.col("Light") > 300.0).agg(
        F.round(F.avg(F.col("Occupancy").cast("double")), 4).alias("occ_rate")
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
