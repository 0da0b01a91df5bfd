"""Streaming MERGE/upsert sink: apply a keyed changelog stream onto a
parquet snapshot directory, exactly-once.

This is the streaming face of the batch MERGE operator
(``plans/analytics.py:orders_merge_upsert``) and the CDC apply
(``plans/events.py:cdc_user_snapshot``): each micro-batch is reduced to
one last-op-wins row per key, merged into the current snapshot with the
same matched-update / not-matched-insert / delete semantics, and the new
snapshot is committed by directory swap.

Exactly-once: the streaming checkpoint makes batch delivery
at-least-once with stable batch ids; each batch writes a VERSIONED
snapshot directory ``snap-{batch_id}`` and commits it with ONE atomic
rename of the ``current`` symlink (write tmp link, ``os.replace``) — so
at every instant ``current`` resolves to a complete snapshot. A crash
before the swap leaves ``current`` on the old snapshot and the replay
rewrites ``snap-{batch_id}`` (overwrite mode) and swaps; a crash after
the swap makes the replay a no-op (the pointer already names this
batch's snapshot — a true exactly-once short-circuit). There is no
rename-pair window in which no snapshot is live (the round-3 two-rename
swap had exactly that window: a crash between ``rename(current, old)``
and ``rename(staging, current)`` made the replay read snapshot=None and
silently rebuild from one batch). Old snapshot dirs are garbage, swept
best-effort after each commit. This is the same copy-on-write +
atomic-pointer shape Delta/Iceberg MERGE executes, minus the manifest
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


def list_snapshots(target_dir: str) -> list[int]:
    """Batch ids of every COMMITTED (complete) snapshot, ascending."""
    if not os.path.isdir(target_dir):
        return []
    return sorted(
        int(d[5:])
        for d in os.listdir(target_dir)
        if d.startswith("snap-")
        and d[5:].lstrip("-").isdigit()
        and os.path.exists(os.path.join(target_dir, d, "_SUCCESS"))
    )


def read_snapshot(spark, target_dir: str, batch_id: int | None = None):
    """Time-travel read: the snapshot as of ``batch_id`` (None = the
    committed current pointer). Requires the sink to have been started
    with ``retain`` large enough that the version still exists —
    the versioned-dir + pointer layout IS the Delta/Iceberg time-travel
    shape, minus the manifest layer."""
    if batch_id is None:
        cur = os.path.join(target_dir, "current")
        return spark.read.parquet(cur)
    snap = os.path.join(target_dir, f"snap-{batch_id}")
    if not os.path.exists(os.path.join(snap, "_SUCCESS")):
        raise FileNotFoundError(
            f"no committed snapshot snap-{batch_id} under {target_dir}; "
            f"retained: {list_snapshots(target_dir)}"
        )
    return spark.read.parquet(snap)


def upsert_sink(
    updates: DataFrame,
    target_dir: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint_dir: str,
    op_col: str | None = None,
    retain: int = 1,
    output_mode: str = "update",
):
    """Start a foreachBatch query maintaining a keyed parquet snapshot.

    ``updates`` is a streaming DataFrame of change rows; ``seq_col``
    orders changes to the same key within a batch (last wins);
    ``op_col``, if given, marks deletes with the value ``'D'``. Returns
    the StreamingQuery.

    ``retain`` keeps the newest N committed snapshots instead of
    sweeping everything but the current one — enabling
    :func:`read_snapshot` time travel and concurrent readers pinned to
    an old version while the sink advances (each version is an
    immutable directory; the pointer swap never touches it).
    """
    cur_link = os.path.join(target_dir, "current")

    def _live_snap() -> str | None:
        """Name of the committed snapshot dir, recovering from crashes
        and migrating the legacy plain-directory layout."""
        if os.path.islink(cur_link):
            return os.readlink(cur_link)
        if os.path.isdir(cur_link):
            # legacy layout: 'current' was the data dir itself — adopt it
            # as a versioned snapshot, then fall through to recovery
            # (which relinks it) so a crash mid-migration self-heals.
            # The legacy dir is complete BY DEFINITION of the old layout
            # (it was the committed data dir), so stamp _SUCCESS
            # unconditionally: recovery's _SUCCESS gate is a guard
            # against snap-* dirs the NEW code wrote and crashed
            # mid-write, and must not reject an adopted snapshot from a
            # cluster running with marksuccessfuljobs=false.
            # stamp BEFORE the rename: a crash between rename and stamp
            # would leave a _SUCCESS-less snap--1 that recovery rejects —
            # the same silent loss one step later. Stamping first is
            # idempotent (mode 'a') and leaves no unrecoverable state.
            open(os.path.join(cur_link, "_SUCCESS"), "a").close()
            os.rename(cur_link, os.path.join(target_dir, "snap--1"))
        if os.path.isdir(target_dir):
            snaps = [
                d
                for d in os.listdir(target_dir)
                if d.startswith("snap-")
                and d[5:].lstrip("-").isdigit()
                # only COMPLETE snapshots are candidates: Spark drops
                # _SUCCESS at job end, so a crash mid-write can never
                # be adopted by recovery
                and os.path.exists(os.path.join(target_dir, d, "_SUCCESS"))
            ]
            if snaps:
                # pointer lost (crash mid-migration / manual tampering):
                # relink the highest committed batch id
                newest = max(snaps, key=lambda d: int(d[5:]))
                _commit(newest)
                return newest
        return None

    def _commit(snap_name: str) -> None:
        tmp = os.path.join(target_dir, f"_current.tmp-{snap_name}")
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(snap_name, tmp)
        os.replace(tmp, cur_link)  # THE atomic commit point

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        snap_name = f"snap-{batch_id}"
        live = _live_snap()
        if live == snap_name:
            return  # replay after a post-commit crash: already applied
        snapshot = (
            spark.read.parquet(os.path.join(target_dir, live))
            if live is not None
            else None
        )
        merged = _merge_batch(snapshot, batch_df, key_cols, seq_col, op_col)
        merged.write.mode("overwrite").parquet(
            os.path.join(target_dir, snap_name)
        )
        _commit(snap_name)
        # sweep superseded snapshots beyond the retention window
        # (best-effort: orphans from a crash here are collected by the
        # next successful batch). Uncommitted (_SUCCESS-less) leftovers
        # are always swept — they are crash debris, never a version.
        keep = set(list_snapshots(target_dir)[-max(int(retain), 1):])
        for name in os.listdir(target_dir):
            if (
                name.startswith("snap-")
                and name != snap_name
                and os.path.isdir(os.path.join(target_dir, name))
                and not (
                    name[5:].lstrip("-").isdigit()
                    and int(name[5:]) in keep
                )
            ):
                shutil.rmtree(os.path.join(target_dir, name), ignore_errors=True)

    # output_mode governs what a STATEFUL upstream emits into the
    # foreachBatch: "update" for CDC-style change rows, "append" when the
    # upstream is a watermarked window/session aggregation and only CLOSED
    # windows should reach the snapshot (the event-time pipeline capstone).
    return (
        updates.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )
