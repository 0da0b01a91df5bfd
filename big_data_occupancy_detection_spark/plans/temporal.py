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
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def orders_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
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
# Forward as-of: for every event, the customer's NEXT order at-or-after
# the event (conversion attribution forward in time). Same union+sort
# single-shuffle plan as the backward form, frame reversed.
# --------------------------------------------------------------------------
@register(
    "orders_asof_events_forward",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             min(o_orderkey) AS o_orderkey,
             round(min_by(o_totalprice, o_orderkey), 4) AS o_totalprice
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS next_orderkey,
           o.o_totalprice AS next_totalprice
    FROM events e
    ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    """,
)
def orders_asof_events_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next order at-or-after each event per user (forward as-of join)."""
    from ..operators.temporal import asof_join_forward

    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    upcoming = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.min("o_orderkey").alias("next_orderkey"),
        F.round(F.min_by("o_totalprice", "o_orderkey"), 4).alias("next_totalprice"),
    )
    joined = asof_join_forward(
        ev.select("event_id", F.col("user_id"), "ts"),
        upcoming.withColumnRenamed("o_custkey", "user_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["next_orderkey", "next_totalprice"],
    )
    return joined.select(
        "event_id", "user_id", "ts", "next_orderkey", "next_totalprice"
    )


# --------------------------------------------------------------------------
# Nearest as-of: each event picks the user's order CLOSEST in time (either
# direction) within a 30-day tolerance — the pandas merge_asof
# direction='nearest' shape. Ties (equidistant before/after) resolve to the
# backward (earlier) order. The oracle is a structurally different plan: a
# banded inequality join enumerating every in-tolerance candidate, then a
# row_number pick ordered by (distance, orderdate) — a TOTAL order, since
# the right side is unique per (custkey, orderdate) and each event
# partition holds one user.
# --------------------------------------------------------------------------
_NEAREST_TOL_S = 30 * 86400


@register(
    "orders_asof_events_nearest",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS orderkey,
             round(max_by(o_totalprice, o_orderkey), 4) AS totalprice
      FROM orders GROUP BY 1, 2),
    cand AS (
      SELECT e.event_id, o.orderkey, o.totalprice,
             abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts))
               AS dist,
             o.o_orderdate AS od
      FROM events e JOIN o ON o.o_custkey = e.user_id
       AND CAST(o.o_orderdate AS TIMESTAMP)
             >= e.ts - INTERVAL {_NEAREST_TOL_S} SECOND
       AND CAST(o.o_orderdate AS TIMESTAMP)
             <= e.ts + INTERVAL {_NEAREST_TOL_S} SECOND),
    best AS (
      SELECT event_id, orderkey, totalprice,
             row_number() OVER (PARTITION BY event_id ORDER BY dist, od) AS rn
      FROM cand)
    SELECT e.event_id, e.user_id, e.ts,
           b.orderkey AS nearest_orderkey,
           b.totalprice AS nearest_totalprice
    FROM events e LEFT JOIN best b ON b.event_id = e.event_id AND b.rn = 1
    """,
)
def orders_asof_events_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest order to each event within ±30 days (nearest as-of join)."""
    from ..operators.temporal import asof_join_nearest

    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    closest = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("nearest_orderkey"),
        F.round(F.max_by("o_totalprice", "o_orderkey"), 4).alias(
            "nearest_totalprice"
        ),
    )
    joined = asof_join_nearest(
        ev.select("event_id", F.col("user_id"), "ts"),
        closest.withColumnRenamed("o_custkey", "user_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        value_cols=["nearest_orderkey", "nearest_totalprice"],
        tolerance_seconds=_NEAREST_TOL_S,
    )
    return joined.select(
        "event_id", "user_id", "ts", "nearest_orderkey", "nearest_totalprice"
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
# Point-in-time training features (the feature-store pattern): each order
# picks up the customer's event-history features AS OF the order date —
# running event/purchase counts and cumulative value — with no leakage
# from later events, via the same one-shuffle asof_join. The feature
# timeline is cumulative per user (incremental frame), deduped to one
# row per (user, ts) so the as-of tie-break is well-defined; cumulative
# value coalesces to 0 cents so the non-null value_cols contract holds
# even when a user's early events carry null values.
# --------------------------------------------------------------------------
@register(
    "order_features_point_in_time",
    oracle="""
    WITH tl AS (
      SELECT user_id, ts, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n_events_before,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER w AS BIGINT) AS n_purchases_before,
             CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)) OVER w, 0)
                  AS BIGINT) AS value_cents_before,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)),
    feat AS (
      SELECT user_id, ts, n_events_before, n_purchases_before,
             value_cents_before
      FROM tl WHERE rn = 1)
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           f.n_events_before, f.n_purchases_before,
           CAST(f.value_cents_before AS DOUBLE) / 100 AS value_before
    FROM orders o
    ASOF LEFT JOIN feat f
      ON o.o_custkey = f.user_id AND CAST(o.o_orderdate AS TIMESTAMP) >= f.ts
    """,
)
def order_features_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order leakage-free user features as of the order date."""
    ev = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
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
        F.col("user_id").alias("o_custkey"),
        "ts",
        "n_events_before",
        "n_purchases_before",
        "value_cents_before",
    )
    joined = asof_join(
        orders,
        feat,
        on=["o_custkey"],
        left_ts="o_orderdate",
        right_ts="ts",
        value_cols=["n_events_before", "n_purchases_before", "value_cents_before"],
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "n_events_before",
        "n_purchases_before",
        (F.col("value_cents_before").cast("double") / 100).alias("value_before"),
    )
