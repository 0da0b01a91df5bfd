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


def checkpoint_for_reuse(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for a frame consumed 2+ times downstream —
    the standing rule that stops multi-consumer lineages re-executing.

    Honors ``SPARK_GRAFT_PLAN_AUDIT=1``: plan-regression tooling sets it
    to SKIP the checkpoint so ``explain``/plan pins see the FULL lineage
    (an eager checkpoint truncates the measured plan to whatever runs
    after it — the round-6 review found part_negative_samples' pin had
    degenerated to "0 exchanges / 0 joins" and asserted nothing). Runtime
    behavior is unchanged: the flag is only set while BUILDING plans for
    inspection, never while executing them.
    """
    import os

    if os.environ.get("SPARK_GRAFT_PLAN_AUDIT") == "1":
        return df
    return df.localCheckpoint(eager=True)
