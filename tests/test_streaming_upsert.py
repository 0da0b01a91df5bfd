"""Streaming left-outer interval join and the MERGE/upsert snapshot sink."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    from big_data_occupancy_detection_spark.streaming.windows import (
        interval_join_streams,
    )

    lsrc = tmp_path / "lo_l"
    rsrc = tmp_path / "lo_r"
    lsrc.mkdir(); rsrc.mkdir()
    (lsrc / "l1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"l_ts": "2026-01-01T09:00:00", "k": 1, "l_val": "matched"},
                {"l_ts": "2026-01-01T09:00:00", "k": 2, "l_val": "lonely"},
            ]
        )
    )
    (rsrc / "r1.json").write_text(
        json.dumps({"r_ts": "2026-01-01T09:20:00", "k": 1, "r_val": "hit"})
    )
    ldf = (
        spark.readStream.format("json")
        .schema("l_ts timestamp, k long, l_val string")
        .load(str(lsrc))
    )
    rdf = (
        spark.readStream.format("json")
        .schema("r_ts timestamp, k long, r_val string")
        .load(str(rsrc))
    )
    out = interval_join_streams(ldf, rdf, "k", how="left_outer")
    q = (
        out.writeStream.format("memory")
        .queryName("lojoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r.l_val, r.r_val) for r in spark.table("lojoin").collect()}
        # watermark hasn't passed k=2's join window: only the match so far
        assert first == {("matched", "hit")}
        # advance BOTH sources' event time far past l_ts + 1h + 2h watermark
        (lsrc / "l2.json").write_text(
            json.dumps({"l_ts": "2026-01-02T00:00:00", "k": 9, "l_val": "wm"})
        )
        (rsrc / "r2.json").write_text(
            json.dumps({"r_ts": "2026-01-02T00:00:00", "k": 9, "r_val": "wm"})
        )
        q.processAllAvailable()
        # one more empty-ish batch lets the state-store eviction emit
        (lsrc / "l3.json").write_text(
            json.dumps({"l_ts": "2026-01-02T01:00:00", "k": 10, "l_val": "wm2"})
        )
        q.processAllAvailable()
        got = {(r.l_val, r.r_val) for r in spark.table("lojoin").collect()}
    finally:
        q.stop()
    assert ("lonely", None) in got, got


def _write_changes(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows))


def test_upsert_sink_maintains_snapshot(spark, tmp_path):
    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink

    src = tmp_path / "changes"
    src.mkdir()
    target = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    _write_changes(
        src / "b1.json",
        [
            {"id": 1, "val": "a", "seq": 1, "op": "U"},
            {"id": 1, "val": "a2", "seq": 2, "op": "U"},  # same-batch last wins
            {"id": 2, "val": "b", "seq": 1, "op": "U"},
        ],
    )
    stream = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q = upsert_sink(stream, target, ["id"], "seq", ckpt, op_col="op")
    try:
        q.processAllAvailable()
        snap1 = {
            (r.id, r.val)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        assert snap1 == {(1, "a2"), (2, "b")}
        # batch 2: update id=2, delete id=1, insert id=3
        _write_changes(
            src / "b2.json",
            [
                {"id": 2, "val": "b2", "seq": 3, "op": "U"},
                {"id": 1, "val": None, "seq": 3, "op": "D"},
                {"id": 3, "val": "c", "seq": 3, "op": "U"},
            ],
        )
        q.processAllAvailable()
        snap2 = {
            (r.id, r.val)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        assert snap2 == {(2, "b2"), (3, "c")}
    finally:
        q.stop()


def test_streaming_materialized_view(spark, tmp_path):
    """Windowed agg in update mode + upsert sink = an incrementally
    maintained materialized view: late rows re-emit their window's key
    and the snapshot converges to the batch answer."""
    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink
    from big_data_occupancy_detection_spark.streaming.windows import tumbling_counts

    src = tmp_path / "mv_src"
    src.mkdir()
    target = str(tmp_path / "mv_snapshot")
    ckpt = str(tmp_path / "mv_ckpt")
    _write_changes(
        src / "b1.json",
        [
            {"ts": "2026-01-01T09:10:00", "event_type": "view", "value": 1.0},
            {"ts": "2026-01-01T09:20:00", "event_type": "view", "value": 2.0},
            {"ts": "2026-01-01T10:05:00", "event_type": "click", "value": 5.0},
        ],
    )
    stream = (
        spark.readStream.format("json")
        .schema("ts timestamp, event_type string, value double")
        .load(str(src))
    )
    agg = tumbling_counts(stream).withColumn("seq", F.col("n_events"))
    q = upsert_sink(
        agg, target, ["window_start", "event_type"], "seq", ckpt
    )
    try:
        q.processAllAvailable()
        snap1 = {
            (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        assert snap1[("2026-01-01 09:00:00", "view")] == (2, 3.0)
        assert snap1[("2026-01-01 10:00:00", "click")] == (1, 5.0)
        # a late row for the 09:00 window (inside the 2h watermark)
        # re-emits that key; the upsert replaces the stale row
        _write_changes(
            src / "b2.json",
            [{"ts": "2026-01-01T09:40:00", "event_type": "view", "value": 4.0}],
        )
        q.processAllAvailable()
        snap2 = {
            (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        assert snap2[("2026-01-01 09:00:00", "view")] == (3, 7.0)
        assert snap2[("2026-01-01 10:00:00", "click")] == (1, 5.0)
    finally:
        q.stop()


def test_upsert_sink_restart_is_exactly_once(spark, tmp_path):
    """Kill the query, restart from the same checkpoint, add a batch:
    the snapshot reflects every batch exactly once."""
    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink

    src = tmp_path / "changes2"
    src.mkdir()
    target = str(tmp_path / "snapshot2")
    ckpt = str(tmp_path / "ckpt2")
    _write_changes(src / "b1.json", [{"id": 1, "val": "x", "seq": 1, "op": "U"}])

    def start():
        stream = (
            spark.readStream.format("json")
            .schema("id long, val string, seq long, op string")
            .load(str(src))
        )
        return upsert_sink(stream, target, ["id"], "seq", ckpt, op_col="op")

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _write_changes(src / "b2.json", [{"id": 2, "val": "y", "seq": 2, "op": "U"}])
    q = start()
    try:
        q.processAllAvailable()
        snap = {
            (r.id, r.val)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
    finally:
        q.stop()
    assert snap == {(1, "x"), (2, "y")}


def test_upsert_commit_has_no_snapshotless_window(spark, tmp_path):
    """Crash-recovery contract of the versioned-snapshot + atomic-pointer
    commit: at every point between batches 'current' resolves to a
    complete snapshot, a replay of an already-committed batch is a no-op,
    and a lost pointer recovers to the newest COMPLETE snapshot."""
    import os

    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink

    src = tmp_path / "cw_changes"
    src.mkdir()
    target = str(tmp_path / "cw_snapshot")
    ckpt = str(tmp_path / "cw_ckpt")
    _write_changes(src / "b1.json", [{"id": 1, "val": "a", "seq": 1, "op": "U"}])
    stream = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q = upsert_sink(stream, target, ["id"], "seq", ckpt, op_col="op")
    try:
        q.processAllAvailable()
        cur = f"{target}/current"
        assert os.path.islink(cur)
        committed = os.readlink(cur)
        # replay-after-commit: simulate the engine re-delivering batch 0 —
        # 'current' must still point at the SAME committed snapshot (the
        # short-circuit), and its content must be intact
        before = {(r.id, r.val) for r in spark.read.parquet(cur).collect()}
        _write_changes(src / "b2.json", [{"id": 2, "val": "b", "seq": 2, "op": "U"}])
        q.processAllAvailable()
        assert os.path.islink(cur) and os.readlink(cur) != committed
        after = {(r.id, r.val) for r in spark.read.parquet(cur).collect()}
        assert after == {(1, "a"), (2, "b")} and before == {(1, "a")}
        # superseded snapshot swept
        snaps = [d for d in os.listdir(target) if d.startswith("snap-")]
        assert snaps == [os.readlink(cur)]
    finally:
        q.stop()

    # lost-pointer recovery: delete the symlink, plant a PARTIAL newer
    # snapshot (no _SUCCESS) — recovery must relink the newest COMPLETE
    # snapshot, never the torn one
    live = os.readlink(cur)
    os.remove(cur)
    os.makedirs(f"{target}/snap-99")
    open(f"{target}/snap-99/part-00000.parquet", "w").close()  # torn write
    _write_changes(src / "b3.json", [{"id": 3, "val": "c", "seq": 3, "op": "U"}])
    stream2 = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q2 = upsert_sink(stream2, target, ["id"], "seq", ckpt, op_col="op")
    try:
        q2.processAllAvailable()
        got = {(r.id, r.val) for r in spark.read.parquet(cur).collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}, (
            "recovery must resume from the complete snapshot "
            f"(was linked to {live})"
        )
    finally:
        q2.stop()


def test_upsert_migrates_legacy_plain_current_dir(spark, tmp_path):
    """A pre-pointer-layout 'current' DATA directory is adopted as a
    versioned snapshot on the first batch instead of being clobbered."""
    import os

    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink

    target = tmp_path / "legacy_target"
    target.mkdir()
    spark.createDataFrame([(7, "legacy", 0)], ["id", "val", "seq"]).write.parquet(
        str(target / "current")
    )
    src = tmp_path / "legacy_changes"
    src.mkdir()
    _write_changes(src / "b1.json", [{"id": 8, "val": "new", "seq": 1, "op": "U"}])
    stream = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q = upsert_sink(
        stream, str(target), ["id"], "seq", str(tmp_path / "legacy_ckpt"),
        op_col="op",
    )
    try:
        q.processAllAvailable()
        got = {
            (r.id, r.val)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        assert got == {(7, "legacy"), (8, "new")}
        assert os.path.islink(f"{target}/current")
    finally:
        q.stop()


def test_upsert_adopts_legacy_dir_without_success_marker(spark, tmp_path):
    """Legacy-layout adoption must not be gated on _SUCCESS: clusters
    running with marksuccessfuljobs=false write committed data dirs with
    no marker, and rejecting the adopted snapshot silently rebuilds from
    one batch — permanent data loss. Round-4 ADVICE finding."""
    import os

    from big_data_occupancy_detection_spark.streaming.upsert import upsert_sink

    target = tmp_path / "legacy_nosuccess"
    target.mkdir()
    spark.createDataFrame([(7, "legacy", 0)], ["id", "val", "seq"]).write.parquet(
        str(target / "current")
    )
    success = target / "current" / "_SUCCESS"
    if success.exists():
        success.unlink()  # simulate marksuccessfuljobs=false
    src = tmp_path / "legacy_nosuccess_changes"
    src.mkdir()
    _write_changes(src / "b1.json", [{"id": 8, "val": "new", "seq": 1, "op": "U"}])
    stream = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q = upsert_sink(
        stream, str(target), ["id"], "seq",
        str(tmp_path / "legacy_nosuccess_ckpt"), op_col="op",
    )
    try:
        q.processAllAvailable()
        got = {
            (r.id, r.val)
            for r in spark.read.parquet(f"{target}/current").collect()
        }
        # the legacy row SURVIVES adoption alongside the new change
        assert got == {(7, "legacy"), (8, "new")}
        assert os.path.islink(f"{target}/current")
    finally:
        q.stop()


def test_snapshot_retention_and_time_travel(spark, tmp_path):
    """retain=N keeps the newest N committed versions as immutable dirs;
    read_snapshot() time-travels to any retained batch id."""
    from big_data_occupancy_detection_spark.streaming.upsert import (
        list_snapshots,
        read_snapshot,
        upsert_sink,
    )

    target = tmp_path / "tt_target"
    src = tmp_path / "tt_changes"
    src.mkdir()
    stream = (
        spark.readStream.format("json")
        .schema("id long, val string, seq long, op string")
        .load(str(src))
    )
    q = upsert_sink(
        stream, str(target), ["id"], "seq", str(tmp_path / "tt_ckpt"),
        op_col="op", retain=3,
    )
    try:
        batches = [
            [{"id": 1, "val": "a", "seq": 0, "op": "U"}],
            [{"id": 2, "val": "b", "seq": 1, "op": "U"}],
            [{"id": 1, "val": "a2", "seq": 2, "op": "U"},
             {"id": 2, "val": None, "seq": 3, "op": "D"}],
        ]
        for i, rows in enumerate(batches):
            _write_changes(src / f"b{i}.json", rows)
            import time as _t

            _t.sleep(0.1)
            q.processAllAvailable()
        assert list_snapshots(str(target)) == [0, 1, 2]
        snap = lambda b: {
            (r.id, r.val)
            for r in read_snapshot(spark, str(target), b).collect()
        }
        assert snap(0) == {(1, "a")}
        assert snap(1) == {(1, "a"), (2, "b")}
        assert snap(2) == {(1, "a2")}
        # None = committed current pointer
        assert snap(None) == {(1, "a2")}
    finally:
        q.stop()
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        read_snapshot(spark, str(target), 99)
