"""Streaming MERGE/upsert sink: apply a keyed changelog stream onto a
parquet snapshot directory, exactly-once.

This is the streaming face of the batch MERGE operator
(``plans/analytics.py:orders_merge_upsert``) and the CDC apply
(``plans/events.py:cdc_user_snapshot``): each micro-batch is reduced to
one last-op-wins row per key, merged into the current snapshot with the
same matched-update / not-matched-insert / delete semantics, and the new
snapshot is committed by directory swap.

Exactly-once: the streaming checkpoint makes batch delivery
at-least-once with stable batch ids; the merge itself is idempotent
(re-applying a batch whose keys are already at those values is a no-op),
and the swap is the atomic commit point — a crash mid-write leaves the
staging dir, never a half-written snapshot. This is the same
copy-on-write shape Delta/Iceberg MERGE executes, minus the manifest
layer; at scale you'd partition the snapshot and rewrite only the
partitions the batch touches.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _merge_batch(
    snapshot: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str | None,
) -> DataFrame:
    """One COW merge: last-op-wins reduce of the batch, then the
    snapshot's rows for keys the batch doesn't touch, unioned with the
    batch's surviving upserts."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        upserts = latest.filter(F.col(op_col) != "D").drop(op_col)
        touched = latest.select(*key_cols)
    else:
        upserts, touched = latest, latest.select(*key_cols)
    if snapshot is None:
        return upserts
    untouched = snapshot.join(touched, on=key_cols, how="left_anti")
    return untouched.unionByName(upserts)


def upsert_sink(
    updates: DataFrame,
    target_dir: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint_dir: str,
    op_col: str | None = None,
):
    """Start a foreachBatch query maintaining a keyed parquet snapshot.

    ``updates`` is a streaming DataFrame of change rows; ``seq_col``
    orders changes to the same key within a batch (last wins);
    ``op_col``, if given, marks deletes with the value ``'D'``. Returns
    the StreamingQuery.
    """
    data_dir = os.path.join(target_dir, "current")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        snapshot = (
            spark.read.parquet(data_dir) if os.path.isdir(data_dir) else None
        )
        merged = _merge_batch(snapshot, batch_df, key_cols, seq_col, op_col)
        staging = os.path.join(target_dir, f"staging-{batch_id}")
        merged.write.mode("overwrite").parquet(staging)
        # atomic-enough commit: readers see either the old or new snapshot
        old = os.path.join(target_dir, f"old-{batch_id}")
        if os.path.isdir(data_dir):
            os.rename(data_dir, old)
        os.rename(staging, data_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        updates.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
