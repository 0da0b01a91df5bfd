"""Temporal join plans — as-of and band joins over the events table.

The reference has no joins (SURVEY.md §2.3); these cover the two
time-series join shapes the engine adds for event pipelines. Oracles use
DuckDB's native ``ASOF JOIN`` and inequality self-join respectively, so
both Spark compositions are verified against a first-class implementation
of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.datetime_fns import epoch_seconds
from ..operators.temporal import asof_join, band_self_join_pairs
from ..sources.readers import table
from ..functions.rounding import portable_round
from .registry import register

# --------------------------------------------------------------------------
# q38 — as-of join: each event picks up the user's most recent order at or
# before the event timestamp. The right side is pre-aggregated to one row
# per (custkey, orderdate) with a deterministic representative so the
# as-of tie-break is well-defined on both engines.
# --------------------------------------------------------------------------


@register(
    "orders_asof_events",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey,
             round(max_by(o_totalprice, o_orderkey), 4) AS o_totalprice
      FROM orders GROUP BY 1, 2),
    ev AS (
      SELECT event_id, user_id, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM ev e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def orders_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-key/null-ts probes pinned OUT on both sides (r7 null fuzz):
    # Spark's window-form as-of groups NULL keys together (null user
    # probes would match null-user rows) while SQL join equality never
    # matches NULL; and DuckDB's ASOF sorts a NULL probe ts as greatest
    # (matching the latest right row) while the operator masks it to a
    # null match. A timestampless/keyless probe has no as-of meaning.
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    orders = table(spark, sf_dir, "orders")
    latest = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("last_orderkey"),
        F.round(F.max_by("o_totalprice", "o_orderkey"), 4).alias("last_totalprice"),
    )
    joined = asof_join(
        ev.select("event_id", F.col("user_id"), "ts"),
        latest.withColumnRenamed("o_custkey", "user_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["last_orderkey", "last_totalprice"],
    )
    return joined.select("event_id", "user_id", "ts", "last_orderkey", "last_totalprice")


# --------------------------------------------------------------------------
# Forward as-of: for every event, the user's NEXT purchase event at or
# after it — time-to-conversion, the forward-in-time attribution lookup.
# Anchored in EVENT time: a cross-table window against orders would be
# vacuously NULL (the orders table's 1990s dates never overlap the 2024
# events range — the round-5 review catch). The right side reduces to one
# representative purchase per (user, ts); the matched timestamp rides
# along as a value column so the output can carry the exact gap.
# --------------------------------------------------------------------------
@register(
    "next_purchase_asof_events",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS pts, max(event_id) AS next_purchase_id
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      GROUP BY 1, 2),
    ev AS (
      SELECT event_id, user_id, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT e.event_id, e.user_id, e.ts,
           p.next_purchase_id,
           (floor(CAST((epoch(p.pts) - epoch(e.ts)) AS DOUBLE) * 10000.0
                  + 0.5) / 10000.0) AS secs_to_purchase
    FROM ev e
    ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.pts
    """,
)
def next_purchase_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next purchase at-or-after each event per user (forward as-of),
    with the exact seconds-to-conversion gap."""
    from ..operators.temporal import asof_join_forward

    # null-key/null-ts probes excluded on both sides — see
    # orders_asof_events (r7 null fuzz)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max("event_id").alias("next_purchase_id"))
        .withColumn("next_purchase_ts", F.col("pts"))
    )
    joined = asof_join_forward(
        ev,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="pts",
        value_cols=["next_purchase_id", "next_purchase_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "next_purchase_id",
        portable_round(
            epoch_seconds("next_purchase_ts") - epoch_seconds("ts"), 4
        ).alias("secs_to_purchase"),
    )


# --------------------------------------------------------------------------
# Nearest as-of: for each purchase, the user's error event CLOSEST in
# time within ±1 day — "did an error coincide with this conversion?" —
# the pandas merge_asof direction='nearest' shape, with the tolerance
# genuinely exercised on shipped data (some purchases have a same-day
# error, others none → real NULLs). Equidistant before/after ties
# resolve to the earlier error. The oracle is a structurally different
# plan: a banded inequality join enumerating every in-tolerance
# candidate, then a row_number pick ordered by (distance, ts) — a TOTAL
# order, since errors are unique per (user, ts) after the reduce and
# each partition holds one purchase.
# --------------------------------------------------------------------------
_NEAREST_TOL_S = 86400


@register(
    "nearest_error_to_purchase",
    oracle=f"""
    WITH pur AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
        AND ts IS NOT NULL AND user_id IS NOT NULL),
    err AS (
      SELECT user_id, ts AS ets, max(event_id) AS nearest_error_id
      FROM events WHERE event_type = 'error' AND ts IS NOT NULL
      GROUP BY 1, 2),
    cand AS (
      SELECT p.event_id, e.nearest_error_id, e.ets,
             abs(epoch_us(e.ets) - epoch_us(p.ts)) AS dist
      FROM pur p JOIN err e ON e.user_id = p.user_id
       AND e.ets >= p.ts - INTERVAL {_NEAREST_TOL_S} SECOND
       AND e.ets <= p.ts + INTERVAL {_NEAREST_TOL_S} SECOND),
    best AS (
      SELECT event_id, nearest_error_id, ets,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY dist, ets) AS rn
      FROM cand)
    SELECT p.event_id, p.user_id, p.ts,
           b.nearest_error_id,
           (floor(CAST((epoch(b.ets) - epoch(p.ts)) AS DOUBLE) * 10000.0
                  + 0.5) / 10000.0) AS err_gap_s
    FROM pur p LEFT JOIN best b ON b.event_id = p.event_id AND b.rn = 1
    """,
)
def nearest_error_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest error event to each purchase within ±1 day (nearest
    as-of join), with the signed gap in seconds."""
    from ..operators.temporal import asof_join_nearest

    # null-key/null-ts probes excluded on both sides (r7 null fuzz)
    pur = (
        table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select("event_id", "user_id", "ts")
    )
    err = (
        table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "error") & F.col("ts").isNotNull())
        .groupBy("user_id", F.col("ts").alias("ets"))
        .agg(F.max("event_id").alias("nearest_error_id"))
        .withColumn("nearest_error_ts", F.col("ets"))
    )
    joined = asof_join_nearest(
        pur,
        err,
        on=["user_id"],
        left_ts="ts",
        right_ts="ets",
        value_cols=["nearest_error_id", "nearest_error_ts"],
        tolerance_seconds=_NEAREST_TOL_S,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "nearest_error_id",
        portable_round(
            epoch_seconds("nearest_error_ts") - epoch_seconds("ts"), 4
        ).alias("err_gap_s"),
    )


# --------------------------------------------------------------------------
# q39 — band self-join: pairs of events by the same user within 15 minutes,
# via the bucketed-replication pattern (hash join, not a nested-loop range
# join). 900 s at sf0.01 → ~230 pairs.
# --------------------------------------------------------------------------
_BAND_S = 900


@register(
    "event_band_pairs",
    oracle=f"""
    SELECT a.user_id,
           a.event_id AS a_id, b.event_id AS b_id,
           (floor(CAST((epoch(b.ts) - epoch(a.ts)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL {_BAND_S} SECOND
     AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
    """,
)
def event_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pairs = band_self_join_pairs(
        ev, on=["user_id"], ts_col="ts", id_col="event_id", band_seconds=_BAND_S
    )
    return pairs.select(
        "user_id",
        "a_id",
        "b_id",
        portable_round(epoch_seconds("b_ts") - epoch_seconds("a_ts"), 4).alias(
            "gap_s"
        ),
    )


# --------------------------------------------------------------------------
# q — temporal motif counting: triangles in the per-user 15-minute band
# graph (three events mutually within the band = a burst triple). Edge
# enumeration reuses the bucketed band join; the triangle closure is two
# hash joins on (user, event-id) — the standard distributed triangle
# pattern where every edge is oriented by the total order (ts, id), so
# each triangle is counted exactly once as i<j<k.
# --------------------------------------------------------------------------
@register(
    "event_burst_triangles",
    oracle=f"""
    WITH e AS (
      SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL {_BAND_S} SECOND
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id)))
    SELECT e1.user_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.user_id = e1.user_id AND e2.a_id = e1.b_id
    JOIN e e3 ON e3.user_id = e1.user_id
             AND e3.a_id = e1.a_id AND e3.b_id = e2.b_id
    GROUP BY 1
    """,
)
def event_burst_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    edges = band_self_join_pairs(
        ev, on=["user_id"], ts_col="ts", id_col="event_id", band_seconds=_BAND_S
    ).select("user_id", "a_id", "b_id")
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = e1.join(
        e2,
        (F.col("e2.user_id") == F.col("e1.user_id"))
        & (F.col("e2.a_id") == F.col("e1.b_id")),
    ).join(
        e3,
        (F.col("e3.user_id") == F.col("e1.user_id"))
        & (F.col("e3.a_id") == F.col("e1.a_id"))
        & (F.col("e3.b_id") == F.col("e2.b_id")),
    )
    return tri.groupBy(F.col("e1.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


# --------------------------------------------------------------------------
# Point-in-interval join: events counted into a deterministic calendar of
# variable-length promo windows (the generic range-lookup shape — IP
# ranges, maintenance windows). The bucketed-replication plan makes it an
# equi-join; the oracle uses DuckDB's native inequality join, so the
# composition is verified against a first-class implementation.
# --------------------------------------------------------------------------

_PROMO_N = 8           # windows
_PROMO_STEP = 432000   # 5 days between window starts
_PROMO_DAY = 86400


def _promos(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """promo_id, lo, hi (epoch seconds): window p starts 5·p days after
    the first event and lasts (p mod 3 + 1) days — deterministic,
    variable-length, derived only from the data."""
    t0 = ev.agg(F.min(epoch_seconds("ts")).alias("__t0"))
    return (
        spark.range(_PROMO_N)
        .withColumnRenamed("id", "promo_id")
        .crossJoin(F.broadcast(t0))
        .select(
            "promo_id",
            (F.col("__t0") + F.col("promo_id") * _PROMO_STEP).alias("lo"),
            (
                F.col("__t0")
                + F.col("promo_id") * _PROMO_STEP
                + (F.col("promo_id") % 3 + 1) * _PROMO_DAY
            ).alias("hi"),
        )
    )


@register(
    "promo_event_counts",
    oracle=f"""
    WITH t0 AS (SELECT min(epoch(ts)) AS t0 FROM events),
    promos AS (
      SELECT p AS promo_id,
             t0 + p * {_PROMO_STEP} AS lo,
             t0 + p * {_PROMO_STEP} + (p % 3 + 1) * {_PROMO_DAY} AS hi
      FROM range({_PROMO_N}) t(p), t0)
    SELECT promo_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events e JOIN promos pr
      ON epoch(e.ts) >= pr.lo AND epoch(e.ts) <= pr.hi
    GROUP BY 1
    """,
)
def promo_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per promo window via the bucketed point-in-interval join
    (bucket = 1 day ≈ the typical window length)."""
    from ..operators.temporal import interval_join

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", epoch_seconds("ts").alias("sec")
    )
    joined = interval_join(
        ev, _promos(spark, table(spark, sf_dir, "events")), "sec", "lo", "hi",
        bucket_width=_PROMO_DAY,
    )
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Point-in-time training features (the feature-store pattern): weekly
# snapshot probes — (user × week-end spine derived from the event range)
# — pick up each user's event-history features AS OF the snapshot
# instant, with no leakage from later events, via the same one-shuffle
# asof_join. Probes are deliberately NOT event rows: the as-of join is
# what materializes features at arbitrary training timestamps. (The
# first draft probed at order dates and was vacuously all-NULL — the
# orders table's 1990s dates never overlap the 2024 events range; the
# spine (day 1 of each of 5 weeks) keeps both real matches and real
# NULLs, since the first snapshot predates some users' first event.) The feature timeline is
# cumulative per user (incremental frame), deduped to one row per
# (user, ts) for a well-defined tie-break; cumulative value coalesces to
# 0 cents so the non-null value_cols contract holds under null event
# values.
# --------------------------------------------------------------------------
@register(
    "user_features_point_in_time",
    oracle="""
    WITH b AS (SELECT date_trunc('week', min(ts)) AS w0 FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    u AS (SELECT DISTINCT user_id FROM events
          WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    spine AS (
      SELECT u.user_id, b.w0 + (k.k * 7 + 1) * INTERVAL 1 DAY AS snap_ts
      FROM u CROSS JOIN b
      CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS k) k),
    tl AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n_events_before,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER w AS BIGINT) AS n_purchases_before,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
                  AS BIGINT) AS value_cents_before,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)),
    feat AS (
      SELECT user_id, ts, n_events_before, n_purchases_before,
             value_cents_before
      FROM tl WHERE rn = 1)
    SELECT s.user_id, s.snap_ts,
           f.n_events_before, f.n_purchases_before,
           CAST(f.value_cents_before AS DOUBLE) / 100 AS value_before
    FROM spine s
    ASOF LEFT JOIN feat f
      ON s.user_id = f.user_id AND s.snap_ts >= f.ts
    """,
)
def user_features_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free user features at 5 weekly snapshot instants."""
    # null-key/null-ts timeline rows excluded on both sides — see
    # orders_asof_events (r7 null fuzz); min(ts) is null-skipping in
    # both engines so the spine anchor is unchanged
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w0 = ev.agg(F.date_trunc("week", F.min("ts")).alias("w0"))
    users = ev.select("user_id").distinct()
    ks = (
        ev.sparkSession.range(5)
        .select(F.col("id").cast("int").alias("k"))
    )
    spine = (
        users.crossJoin(F.broadcast(w0))
        .crossJoin(F.broadcast(ks))
        .select(
            "user_id",
            F.expr(
                "w0 + make_interval(0, 0, 0, CAST(k * 7 + 1 AS INT))"
            ).alias("snap_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    tl = ev.select(
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_events_before"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("n_purchases_before"),
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("long")).over(w), F.lit(0)
        )
        .cast("long")
        .alias("value_cents_before"),
        F.row_number().over(wrn).alias("rn"),
    ).filter(F.col("rn") == 1)
    feat = tl.select(
        "user_id",
        "ts",
        "n_events_before",
        "n_purchases_before",
        "value_cents_before",
    )
    joined = asof_join(
        spine,
        feat,
        on=["user_id"],
        left_ts="snap_ts",
        right_ts="ts",
        value_cols=["n_events_before", "n_purchases_before", "value_cents_before"],
    )
    return joined.select(
        "user_id",
        "snap_ts",
        "n_events_before",
        "n_purchases_before",
        (F.col("value_cents_before").cast("double") / 100).alias("value_before"),
    )
