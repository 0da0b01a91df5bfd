"""Watermarked window aggregation tests on a file-source event stream."""

from __future__ import annotations

import json

from big_data_occupancy_detection_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
)

EVENTS = [
    # user 1: two sessions (09:00-09:10, then 10:30) given a 30-min gap
    {"ts": "2026-01-01T09:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
    {"ts": "2026-01-01T09:10:00", "user_id": 1, "event_type": "click", "value": 2.0},
    {"ts": "2026-01-01T10:30:00", "user_id": 1, "event_type": "view", "value": 3.0},
    # user 2: one event
    {"ts": "2026-01-01T09:45:00", "user_id": 2, "event_type": "click", "value": 4.0},
]


def _stream(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir(exist_ok=True)
    (src / "b.json").write_text("\n".join(json.dumps(e) for e in EVENTS))
    raw = (
        spark.readStream.format("json")
        .schema("ts timestamp, user_id long, event_type string, value double")
        .load(str(src))
    )
    return raw


def test_tumbling_counts(spark, tmp_path):
    # complete output mode: a finite file source never advances the
    # watermark past open windows, so append mode would emit nothing
    out2 = tumbling_counts(_stream(spark, tmp_path))
    q2 = (
        out2.writeStream.format("memory")
        .queryName("tumbling_complete")
        .outputMode("complete")
        .start()
    )
    try:
        q2.processAllAvailable()
        rows = {
            (r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
            for r in spark.table("tumbling_complete").collect()
        }
    finally:
        q2.stop()
    assert rows[(9, "click")] == (3, 7.0)   # 2 from user1 + 1 from user2
    assert rows[(10, "view")] == (1, 3.0)


def test_session_counts(spark, tmp_path):
    out = session_counts(_stream(spark, tmp_path))
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_complete")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = sorted(
            (r.user_id, r.session_start.strftime("%H:%M"), r.n_events)
            for r in spark.table("sessions_complete").collect()
        )
    finally:
        q.stop()
    # user 1 splits into two sessions across the 80-minute gap; user 2 has one
    assert rows == [(1, "09:00", 2), (1, "10:30", 1), (2, "09:45", 1)]


def test_dedup_stream_drops_in_window_duplicates(spark, tmp_path):
    import json as _json

    from big_data_occupancy_detection_spark.streaming.windows import dedup_stream

    src = tmp_path / "dd"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01T09:00:00", "user_id": 1, "event_type": "a", "value": 1.0},
        {"ts": "2026-01-01T09:00:30", "user_id": 1, "event_type": "a", "value": 1.0},
        {"ts": "2026-01-01T09:05:00", "user_id": 2, "event_type": "b", "value": 2.0},
    ]
    (src / "b.json").write_text("\n".join(_json.dumps(e) for e in rows))
    raw = (
        spark.readStream.format("json")
        .schema("ts timestamp, user_id long, event_type string, value double")
        .load(str(src))
    )
    out = dedup_stream(raw, ["user_id", "event_type"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.event_type) for r in spark.table("dedup_stream_t").collect()
        )
    finally:
        q.stop()
    assert got == [(1, "a"), (2, "b")]


def test_interval_join_streams(spark, tmp_path):
    import json as _json

    from big_data_occupancy_detection_spark.streaming.windows import (
        interval_join_streams,
    )

    lsrc = tmp_path / "ljoin"
    rsrc = tmp_path / "rjoin"
    lsrc.mkdir(); rsrc.mkdir()
    (lsrc / "l.json").write_text(
        "\n".join(
            _json.dumps(e)
            for e in [
                {"l_ts": "2026-01-01T09:00:00", "k": 1, "l_val": "a"},
                {"l_ts": "2026-01-01T12:00:00", "k": 2, "l_val": "b"},
            ]
        )
    )
    (rsrc / "r.json").write_text(
        "\n".join(
            _json.dumps(e)
            for e in [
                {"r_ts": "2026-01-01T09:20:00", "k": 1, "r_val": "in-window"},
                {"r_ts": "2026-01-01T11:00:00", "k": 1, "r_val": "too-late"},
                {"r_ts": "2026-01-01T11:00:00", "k": 2, "r_val": "before-left"},
            ]
        )
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
    out = interval_join_streams(ldf, rdf, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("sjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [(r.l_val, r.r_val) for r in spark.table("sjoin").collect()]
    finally:
        q.stop()
    # only the right row within [l_ts, l_ts+1h] of a same-key left row joins
    assert got == [("a", "in-window")]


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static left join: every streamed row is enriched from the
    static dim; unmatched keys survive with nulls (left semantics)."""
    import json

    from big_data_occupancy_detection_spark.streaming.windows import (
        enrich_stream_static,
    )

    src = tmp_path / "ev"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"user_id": 1, "v": 10.0},
                {"user_id": 2, "v": 20.0},
                {"user_id": 99, "v": 5.0},  # no dim row
            ]
        )
    )
    schema = "user_id long, v double"
    stream = spark.readStream.schema(schema).json(str(src))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], ["user_id", "segment"]
    )
    out = enrich_stream_static(stream, dim, on=["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.user_id: r.segment for r in spark.table("enriched_out").collect()}
    finally:
        q.stop()
    assert rows == {1: "gold", 2: "silver", 99: None}


def test_sliding_distinct_counts_matches_batch(spark, tmp_path):
    """Streaming sliding distinct (watermarked dedupe-then-count, append
    mode) must emit exactly the batch twin's rows for every window the
    watermark has closed — duplicates within and across micro-batches
    collapse once."""
    import json as _json

    from pyspark.sql import functions as F

    from big_data_occupancy_detection_spark.streaming.windows import (
        sliding_distinct_counts,
    )

    def ev(h, m, u):
        return {"ts": f"2026-01-01T{h:02d}:{m:02d}:00", "user_id": u}

    b1 = [ev(9, 0, 1), ev(9, 10, 1), ev(9, 20, 2), ev(10, 5, 1)]
    b2 = [ev(10, 30, 3), ev(10, 40, 1), ev(9, 50, 2)]
    # watermark pusher: 3 days later, closes every earlier window
    b3 = [ev(9, 0, 99)]
    b3[0]["ts"] = "2026-01-04T09:00:00"

    src = tmp_path / "ev"
    src.mkdir()
    schema = "ts timestamp, user_id long"
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    q = (
        sliding_distinct_counts(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("sliding_distinct")
        .outputMode("append")
        .start()
    )
    try:
        for i, b in enumerate([b1, b2, b3]):
            (src / f"b{i}.json").write_text(
                "\n".join(_json.dumps(e) for e in b)
            )
            q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r.win_start), str(r.win_end)): r.n_users
        for r in spark.table("sliding_distinct").collect()
    }

    # expected side deliberately SPELLS OUT the batch semantics
    # (window-replicate, dedupe, count) rather than calling the operator
    # on a batch frame — calling shared code would make the equality
    # trivially true instead of checking the streaming machinery
    all_ev = spark.createDataFrame(
        [(e["ts"], e["user_id"]) for e in b1 + b2], "ts string, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    expect = {
        (str(r.win_start), str(r.win_end)): r.n_users
        for r in all_ev.select(
            F.window("ts", "2 hours", "1 hour").alias("win"), "user_id"
        )
        .dropDuplicates(["win", "user_id"])
        .groupBy("win")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_users",
        )
        .collect()
    }
    # every closed window from the first two batches must match exactly
    for k, v in expect.items():
        assert got.get(k) == v, (k, v, got)
    assert len(expect) == 3  # events span 9:00-10:40 -> 3 hop windows
