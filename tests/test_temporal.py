"""Unit tests for the temporal join operators (as-of join, band join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.operators.temporal import (
    asof_join,
    band_self_join_pairs,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts("2024-01-01 10:00:00"), e="a"),
            Row(k=1, lts=_ts("2024-01-01 12:00:00"), e="b"),
            Row(k=1, lts=_ts("2024-01-01 09:00:00"), e="early"),
            Row(k=2, lts=_ts("2024-01-01 11:00:00"), e="other-key"),
            Row(k=3, lts=_ts("2024-01-01 11:00:00"), e="no-match-key"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01 09:30:00"), price=10.0),
            Row(k=1, rts=_ts("2024-01-01 12:00:00"), price=20.0),  # tie: visible
            Row(k=2, rts=_ts("2024-01-01 10:59:59"), price=30.0),
        ]
    )
    out = {
        r.e: r.price
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", value_cols=["price"]
        ).collect()
    }
    assert out == {
        "a": 10.0,        # most recent <= 10:00 is 09:30
        "b": 20.0,        # equal timestamp is visible
        "early": None,    # nothing at/before 09:00
        "other-key": 30.0,
        "no-match-key": None,  # left join: key with no right rows survives
    }


def test_band_self_join_pairs_exact_window(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = [
        Row(g=1, id=1, t=base),
        Row(g=1, id=5, t=base),                              # tie with id 1
        Row(g=1, id=2, t=base + dt.timedelta(seconds=50)),
        Row(g=1, id=3, t=base + dt.timedelta(seconds=60)),   # boundary: inclusive
        Row(g=1, id=4, t=base + dt.timedelta(seconds=121)),  # out of band of 3
        Row(g=2, id=6, t=base),                              # other group: no pair
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r.a_id, r.b_id)
        for r in band_self_join_pairs(
            df, on=["g"], ts_col="t", id_col="id", band_seconds=60
        ).collect()
    }
    assert pairs == {(1, 5), (1, 2), (1, 3), (5, 2), (5, 3), (2, 3)}


def test_band_join_crosses_bucket_boundary(spark):
    """A pair whose two sides land in adjacent time buckets must be found
    (the reason the b-side is replicated into its predecessor bucket)."""
    base = _ts("2024-01-01 00:00:59")
    df = spark.createDataFrame(
        [
            Row(g=1, id=1, t=base),                            # bucket 0
            Row(g=1, id=2, t=base + dt.timedelta(seconds=2)),  # bucket 1
        ]
    )
    out = band_self_join_pairs(
        df, on=["g"], ts_col="t", id_col="id", band_seconds=60
    ).collect()
    assert [(r.a_id, r.b_id) for r in out] == [(1, 2)]


def test_asof_join_rejects_colliding_value_cols(spark):
    """A value_col that already exists on the left must raise, not silently
    null out the left column (ADVICE r1)."""
    import pytest

    left = spark.createDataFrame([Row(k=1, lts=_ts("2024-01-01 10:00:00"), price=1.0)])
    right = spark.createDataFrame([Row(k=1, rts=_ts("2024-01-01 09:00:00"), price=2.0)])
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", value_cols=["price"]
        )


def test_grouped_ewma_string_key(spark):
    """grouped_ewma must work for non-integer keys (sensor/user ids) — the
    output schema derives the key dtype from the input (ADVICE r1)."""
    from big_data_occupancy_detection_spark.operators.temporal import grouped_ewma

    df = spark.createDataFrame(
        [
            Row(sensor="a", seq=1, v=10.0),
            Row(sensor="a", seq=2, v=20.0),
            Row(sensor="b", seq=1, v=5.0),
        ]
    )
    out = {
        r.sensor: (r.n_events, r.ewma_value)
        for r in grouped_ewma(
            df, key_col="sensor", order_cols=["seq"], value_col="v", alpha=0.5
        ).collect()
    }
    assert out["a"] == (2, 15.0)  # 10 -> 0.5*10 + 0.5*20
    assert out["b"] == (1, 5.0)


def test_interval_join_matches_naive_and_avoids_nested_loop(spark):
    """The bucketed interval join must equal the naive range-predicate
    join on every (point, interval) pair — including intervals spanning
    many buckets and points exactly on lo/hi — and must plan as an
    equi-join (hash/sort-merge on the cell), never a nested-loop or
    cartesian."""
    from pyspark.sql import functions as F

    from big_data_occupancy_detection_spark.operators.temporal import interval_join
    from big_data_occupancy_detection_spark.planaudit import plan_metrics

    points = spark.range(0, 500).select(
        F.col("id").alias("pid"), (F.col("id") * 7 % 300).cast("double").alias("x")
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 250.0), (3, 100.0, 100.0), (4, 290.0, 299.0)],
        ["iv_id", "lo", "hi"],
    )
    got = sorted(
        (r.pid, r.iv_id)
        for r in interval_join(points, intervals, "x", "lo", "hi", 20.0).collect()
    )
    want = sorted(
        (r.pid, r.iv_id)
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 0
    m = plan_metrics(interval_join(points, intervals, "x", "lo", "hi", 20.0))
    assert not m["cartesian"]
    assert m["joins"].get("BroadcastNestedLoopJoin", 0) == 0


def test_asof_null_timestamps_never_match(spark):
    """NULL probe timestamps get NULL fills (SQL ASOF: ts >= / <= NULL is
    never true), and NULL right timestamps are invisible — in BOTH
    directions. Regression: a nulls-first sort once leaked the earliest
    right row into a null probe's forward frame."""
    import datetime as dt

    from big_data_occupancy_detection_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    ldf = spark.createDataFrame(
        [(1, 0, t(10)), (2, 0, None), (3, 0, t(30))],
        "lid LONG, k LONG, lts TIMESTAMP",
    )
    rdf = spark.createDataFrame(
        [(0, t(20), 20.0), (0, None, 99.0)],
        "k LONG, rts TIMESTAMP, val DOUBLE",
    )
    fwd = {
        r.lid: r.val
        for r in asof_join_forward(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }
    assert fwd == {1: 20.0, 2: None, 3: None}
    bwd = {
        r.lid: r.val
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }
    assert bwd == {1: None, 2: None, 3: 20.0}


def test_asof_nearest_semantics(spark):
    """Nearest as-of: min |dist| wins, equidistant ties go BACKWARD, the
    tolerance bound is INCLUSIVE, null probes and null right timestamps
    never match."""
    import datetime as dt

    from big_data_occupancy_detection_spark.operators.temporal import (
        asof_join_nearest,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    ldf = spark.createDataFrame(
        [
            (1, 0, t(10)),   # equidistant to r@5 and r@15 -> backward (5)
            (2, 0, t(14)),   # nearer to r@15
            (3, 0, t(40)),   # only r@15 within nothing... dist 25 min
            (4, 0, None),    # null probe -> null
            (5, 1, t(10)),   # key with only a null right ts -> null
        ],
        "lid LONG, k LONG, lts TIMESTAMP",
    )
    rdf = spark.createDataFrame(
        [(0, t(5), 5.0), (0, t(15), 15.0), (1, None, 99.0)],
        "k LONG, rts TIMESTAMP, val DOUBLE",
    )
    got = {
        r.lid: r.val
        for r in asof_join_nearest(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }
    assert got == {1: 5.0, 2: 15.0, 3: 15.0, 4: None, 5: None}

    # inclusive tolerance: lid=3 is exactly 25 min from r@15
    tol = {
        r.lid: r.val
        for r in asof_join_nearest(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["val"], tolerance_seconds=25 * 60,
        ).collect()
    }
    assert tol[3] == 15.0
    just_under = {
        r.lid: r.val
        for r in asof_join_nearest(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["val"], tolerance_seconds=25 * 60 - 1,
        ).collect()
    }
    assert just_under[3] is None and just_under[2] == 15.0


def test_asof_nearest_one_shuffle_one_sort(spark):
    """The nearest join must shuffle ONCE (like the backward twin); the
    two directional fills each get an in-partition sort + WindowExec —
    and neither may plan the O(n²) UnboundedFollowing frame."""
    import datetime as dt

    from big_data_occupancy_detection_spark.operators.temporal import (
        asof_join_nearest,
    )

    ldf = spark.createDataFrame(
        [(1, 0, dt.datetime(2024, 1, 1))], "lid LONG, k LONG, lts TIMESTAMP"
    )
    rdf = spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1.0)], "k LONG, rts TIMESTAMP, val DOUBLE"
    )
    plan = (
        asof_join_nearest(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SinglePartition" not in plan, plan
    assert plan.count("Window") == 2, plan
    assert "unboundedfollowing" not in plan.lower(), plan


def test_asof_registry_queries_not_vacuous(spark):
    """Regression (round-5 review): the forward/nearest/point-in-time
    registry queries were once anchored on the orders table, whose 1990s
    dates never overlap the 2024 events range — every match column was
    NULL and oracle parity passed vacuously. Pin that each query now
    produces BOTH real matches and (where the data affords them) real
    NULLs, so a testdata regeneration that re-vacuates them fails loudly
    instead of silently gutting the gates."""
    from pyspark.sql import functions as F

    from big_data_occupancy_detection_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"

    def counts(name, col):
        df = REGISTRY[name].fn(spark, sf)
        r = df.agg(
            F.count(F.lit(1)).alias("n"), F.count(col).alias("nn")
        ).first()
        return r.n, r.nn

    n, nn = counts("orders_asof_events", "last_orderkey")
    assert n > 0 and nn > 0, (n, nn)
    n, nn = counts("next_purchase_asof_events", "next_purchase_id")
    assert nn > 0 and n - nn > 0, (n, nn)  # matches AND no-later-purchase nulls
    n, nn = counts("nearest_error_to_purchase", "nearest_error_id")
    assert nn > 0 and n - nn > 0, (n, nn)  # matches AND out-of-tolerance nulls
    n, nn = counts("user_features_point_in_time", "n_events_before")
    assert n > 0 and nn > 0, (n, nn)


def test_cusum_accumulator_equals_one_shot_fold(spark):
    """Streaming CUSUM twin (round 7): sequential per-batch application
    over time-ordered batches is BIT-IDENTICAL to the one-shot fold —
    left folds compose over ordered concatenation even though max(0,·)
    is not mergeable. Null ts/value rows are excluded like the batch
    query; unseen keys read 0.0."""
    from big_data_occupancy_detection_spark.operators.temporal import (
        CusumAccumulator,
    )

    K = 50.0
    rows = []
    vals = {}
    for i in range(90):
        u = i % 3
        v = float((i * 37) % 113)
        rows.append((u, i, v))
        vals.setdefault(u, []).append(v)
    # a null value and a null order key must be ignored
    rows.append((1, None, 999.0))
    rows.append((2, 91, None))

    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    acc = CusumAccumulator(k=K)
    # three time-ordered batches (append-only ingest contract)
    for lo, hi in ((0, 30), (30, 60), (60, 95)):
        acc.merge_batch(
            df.filter(
                (F.col("ts") >= lo) & (F.col("ts") < hi)
                | F.col("ts").isNull()
            ),
            "user_id",
            ["ts"],
            "value",
        )

    for u, ys in vals.items():
        s = 0.0
        for y in ys:
            s = max(0.0, s + y - K)
        assert acc.value(u) == s, u  # bit-identical, not approx
        assert acc.counts[u] == len(ys)
        assert acc.drifted(u, h=0.0) == (s > 0.0)
    assert acc.value("never-seen") == 0.0 and not acc.drifted("never-seen", 5)


def test_cusum_accumulator_null_key_state_survives_batches(spark):
    """r7 review: a NULL key is a real group (the batch twin's groupBy
    emits one) — the seed join must be null-safe, or the NULL group's
    fold silently restarts at 0.0 every batch while counts accumulate."""
    from big_data_occupancy_detection_spark.operators.temporal import (
        CusumAccumulator,
    )

    K = 10.0
    ys = [30.0, 5.0, 40.0, 2.0, 25.0, 33.0]
    acc = CusumAccumulator(k=K)
    df = spark.createDataFrame(
        [(None, i, y) for i, y in enumerate(ys)],
        "user_id long, ts long, value double",
    )
    for lo, hi in ((0, 2), (2, 4), (4, 6)):
        acc.merge_batch(
            df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)),
            "user_id",
            ["ts"],
            "value",
        )
    s = 0.0
    for y in ys:
        s = max(0.0, s + y - K)
    assert acc.value(None) == s
    assert acc.counts[None] == len(ys)


def test_ks_drift_accumulator_exact_and_order_independent(spark):
    """The streaming KS must (1) equal an independent integer-arithmetic
    fold over the raw values, (2) be identical for ANY batch split of
    the same rows (counts merge, unlike CUSUM's ordered fold), and (3)
    exclude null keys/values like the batch twin."""
    from big_data_occupancy_detection_spark.operators.temporal import (
        KsDriftAccumulator,
    )

    # reference: triangular-ish integer cents; live: shifted version
    ref_rows = [("a", (i * 13) % 40) for i in range(200)] + [
        ("b", (i * 7) % 25) for i in range(120)
    ]
    live_rows = [("a", ((i * 11) % 40) + 5) for i in range(150)] + [
        ("b", (i * 7) % 25) for i in range(90)  # same shape -> small D
    ]
    live_rows += [(None, 3), ("a", None)]  # must be ignored

    ref_df = spark.createDataFrame(ref_rows, "k string, v long")
    acc = KsDriftAccumulator()
    acc.set_reference(ref_df, "k", "v")

    live_df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(live_rows)],
        "k string, v long, i long",
    )
    # three arbitrary batch splits
    for lo, hi in ((0, 100), (100, 200), (200, 400)):
        acc.merge_batch(
            live_df.filter((F.col("i") >= lo) & (F.col("i") < hi)), "k", "v"
        )

    # one-shot twin + reversed batch order must produce identical state
    acc2 = KsDriftAccumulator()
    acc2.set_reference(ref_df, "k", "v")
    for lo, hi in ((200, 400), (100, 200), (0, 100)):
        acc2.merge_batch(
            live_df.filter((F.col("i") >= lo) & (F.col("i") < hi)), "k", "v"
        )
    assert acc.live == acc2.live and acc.ref == acc2.ref

    # independent exact fold over raw python values
    for key in ("a", "b"):
        ref_v = sorted(v for k, v in ref_rows if k == key)
        live_v = sorted(
            v for k, v in live_rows if k == key and v is not None and k is not None
        )
        n_a, n_b = len(live_v), len(ref_v)
        d_num = 0
        for x in sorted(set(ref_v) | set(live_v)):
            ca = sum(1 for v in live_v if v <= x)
            cb = sum(1 for v in ref_v if v <= x)
            d_num = max(d_num, abs(ca * n_b - cb * n_a))
        expect = float(d_num) / (float(n_a) * float(n_b))
        assert acc.ks(key) == expect  # bit-identical, not approx

    # the shifted key drifts, the same-shape key doesn't
    assert acc.ks("a") > acc.ks("b")
    assert acc.drifted("a", 0.1)
    assert acc.ks("never-seen") is None
    assert not acc.drifted("never-seen", 0.0)


def test_ks_drift_accumulator_max_distinct_guard(spark):
    from big_data_occupancy_detection_spark.operators.temporal import (
        KsDriftAccumulator,
    )

    acc = KsDriftAccumulator(max_distinct=10)
    df = spark.createDataFrame(
        [("a", i) for i in range(25)], "k string, v long"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_distinct"):
        acc.merge_batch(df, "k", "v")


def test_ks_drift_accumulator_max_keys_guard(spark):
    """Round-8 advice: the KEY axis is capped like the value axis —
    driver state must fail loudly, transactionally (batch NOT applied),
    instead of growing silently under a runaway key column."""
    from big_data_occupancy_detection_spark.operators.temporal import (
        KsDriftAccumulator,
    )

    acc = KsDriftAccumulator(max_keys=5)
    ok = spark.createDataFrame(
        [(f"k{i:02d}", i % 3) for i in range(15)], "k string, v long"
    )
    acc.merge_batch(ok.filter(F.col("k") < "k05"), "k", "v")
    before = {k: dict(v) for k, v in acc.live.items()}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_keys"):
        acc.merge_batch(ok, "k", "v")
    assert acc.live == before  # transactional: nothing half-applied


def test_accumulator_foreach_batch_replay_is_idempotent(spark):
    """Round-8 advice: foreachBatch is at-least-once — a batch that was
    FULLY applied before the offsets committed is redelivered on
    restart. Every accumulator's foreach_batch closure must skip a
    batch_id it has already applied (additive CMS/KS/CUSUM state would
    otherwise double-count), while a HIGHER batch_id still applies."""
    from big_data_occupancy_detection_spark.ext.sketches import (
        CmsAccumulator,
        KmvAccumulator,
    )
    from big_data_occupancy_detection_spark.operators.temporal import (
        CusumAccumulator,
        KsDriftAccumulator,
    )

    df1 = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 7.0), ("b", 1, 3.0)],
        "k string, t long, v double",
    )
    df2 = spark.createDataFrame([("a", 3, 9.0)], "k string, t long, v double")

    cms = CmsAccumulator()
    fn = cms.foreach_batch("k")
    fn(df1, 0)
    g0 = dict(cms.grid)
    fn(df1, 0)  # redelivery: full-apply-then-redeliver must be a no-op
    assert cms.grid == g0
    fn(df2, 1)
    assert cms.estimate("a") == 3  # 2 from batch 0 + 1 from batch 1

    cus = CusumAccumulator(k=1.0)
    fn = cus.foreach_batch("k", ["t"], "v")
    fn(df1, 0)
    s0, c0 = dict(cus.state), dict(cus.counts)
    fn(df1, 0)
    assert cus.state == s0 and cus.counts == c0
    fn(df2, 1)
    assert cus.counts["a"] == 3

    ks = KsDriftAccumulator()
    ks.set_reference(df1, "k", "v")
    fn = ks.foreach_batch("k", "v")
    fn(df1, 0)
    l0 = {k: dict(v) for k, v in ks.live.items()}
    fn(df1, 0)
    assert ks.live == l0
    fn(df2, 1)
    assert sum(ks.live["a"].values()) == 3

    kmv = KmvAccumulator(k=4)
    fn = kmv.foreach_batch("v", "k")
    fn(df1, 0)
    st0 = {g: list(h) for g, h in kmv.state.items()}
    fn(df1, 0)
    assert kmv.state == st0
    # a FRESH closure is a fresh guard (new query, ids restart at 0)
    fn2 = kmv.foreach_batch("v", "k")
    fn2(df2, 0)
    assert kmv.estimate("a") == 3.0
