"""Partition-management helpers.

``repartition_for_compute`` protects expression-heavy operators (hash
signatures, shingling, vector math) from tiny-input skew: a small parquet
file arrives as ONE partition, so a CPU-bound pipeline would run on one
core regardless of cluster size. If the input has fewer partitions than
the session's default parallelism, redistribute round-robin first.

At real scale this is a no-op: a 100 TB scan already yields one partition
per ~128 MB split (``spark.sql.files.maxPartitionBytes``), far above
default parallelism, so the conditional never fires and no shuffle is
added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def repartition_for_compute(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
