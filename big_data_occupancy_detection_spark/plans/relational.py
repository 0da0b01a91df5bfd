"""Relational query plans over the star schema (SURVEY.md §2.2-2.7 + joins).

The reference's dominant relational pattern is "filtered grouped aggregate"
(``eda/eda_analysis.py:148-166``, ``ml/train_model.py:239-243``); it has NO
joins (SURVEY.md §2.3) — the join family here is the engine's required
generalization, expressed declaratively so Catalyst picks broadcast vs
sort-merge (dimensions get explicit ``broadcast()`` hints).

Scale notes per query are inline; every aggregate is partial-aggregated
map-side by Catalyst, every dimension join is broadcast, and no query
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import (
    describe_stats,
    global_row_number,
    grouped_percentiles,
    null_census,
    salted_join,
)
from ..operators.topk import top_k_per_group
from ..sources.readers import table
from ..functions.rounding import portable_round, portable_round_sql
from .registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan → filter → 8-agg groupBy → sort.
# Mirrors the reference's grouped-multi-agg pattern (eda/eda_analysis.py:79-86).
# Scale: pure map-side partial agg into 6 groups; shuffle is 6 rows/partition.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                                                                            AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
                                                                            AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
                                                                            AS sum_charge,
           (floor(CAST((avg(l_quantity)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_qty,
           (floor(CAST((avg(l_extendedprice)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_price,
           (floor(CAST((avg(l_discount)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # money sums as EXACT scaled integers (r10, after the sf0.1 sweep
    # caught priority_grouping_sets diverging cross-engine in the 4th
    # decimal): price/disc_price/charge are exact 2/4/6-decimal
    # rationals, so summing round(x·10^d) longs is order-independent at
    # any scale, where round(sum(double), 4) carries ~|sum|·√n·ε of
    # summation-order noise (≈2.6e-4 at sf0.1 — already over the
    # rounding grain). sum_qty stays float: quantity sums are ~1e6 with
    # ~1e-10 noise, 6 orders of margin.
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    scaled = lambda expr, s: (
        F.sum(F.round(expr * s).cast("long")).cast("double") / float(s)
    )
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            scaled(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            scaled(disc_price, 10_000).alias("sum_disc_price"),
            scaled(disc_price * (1 + F.col("l_tax")), 1_000_000).alias("sum_charge"),
            portable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            portable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            portable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — shipping priority (TPC-H Q3 shape): 3-way join → agg → top-10.
# Scale: customer filter prunes before the join; orders⋈lineitem is the big
# shuffle join on l_orderkey (AQE handles skew); top-k is a global sort of
# an already-aggregated (small) result.
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-03-15")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q03 — region revenue (TPC-H Q5 shape): 5-way star join → per-region agg.
# Scale: region/nation are broadcast (5/25 rows); customer joins orders on
# the key both sides can pre-partition on; one big shuffle for o⋈l.
# --------------------------------------------------------------------------
@register(
    "region_revenue",
    oracle="""
    SELECT r.r_name,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                              AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
           count(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY r.r_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            # exact 1e-4-scaled integers before the round-2: per-region
            # sums are ~4.5e9 at sf0.1 (r10 global-money-sum hardening)
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 10_000
                    ).cast("long")
                ).cast("double") / 10_000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q04 — semi join: order-priority census of orders having a heavy lineitem.
# --------------------------------------------------------------------------
@register(
    "priority_semi_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    heavy = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q05 — anti join: customers with no 1995 order, per market segment.
# --------------------------------------------------------------------------
@register(
    "inactive_customers_anti_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                        AND o.o_orderdate <  TIMESTAMP '1996-01-01')
    GROUP BY c_mktsegment
    """,
)
def inactive_customers_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    o95 = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1996-01-01"))
    )
    return (
        cust.join(o95, cust.c_custkey == o95.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# q06 — global agg under compound predicate (TPC-H Q6 / SURVEY A4 shape:
# `eda_analysis.py:148-166` occupancy-rate-under-threshold).
# Scale: scan-only with full predicate pushdown; zero shuffle (1-row reduce).
# --------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_items,
           (floor(CAST((avg(l_quantity)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact 1e-4-scaled integers (r10): a global money sum —
            # see priority_grouping_sets for the sf0.1 divergence class
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 10_000
                    ).cast("long")
                ).cast("double") / 10_000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            portable_round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# q07 — null census, one scan (SURVEY A5: eda_analysis.py:35-39).
# --------------------------------------------------------------------------
@register(
    "null_census_events",
    oracle="""
    SELECT CAST(sum(CASE WHEN event_id  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id,
           CAST(sum(CASE WHEN ts        IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts,
           CAST(sum(CASE WHEN user_id   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id,
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type,
           CAST(sum(CASE WHEN value     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value,
           CAST(sum(CASE WHEN props     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props
    FROM events
    """,
)
def null_census_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return null_census(table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# q08 — describe (SURVEY A6) as a typed long-format single-pass aggregate.
# --------------------------------------------------------------------------
_DESCRIBE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "describe_lineitem",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(count({c}) AS DOUBLE)      AS n,
           {portable_round_sql(f'avg({c})', 6)}              AS mean,
           round(stddev_samp({c}), 6)      AS std,
           CAST(min({c}) AS DOUBLE)        AS min,
           CAST(max({c}) AS DOUBLE)        AS max
    FROM lineitem"""
        for c in _DESCRIBE_COLS
    ),
)
def describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = describe_stats(table(spark, sf_dir, "lineitem"), _DESCRIBE_COLS)
    return out.select(
        "col_name",
        "n",
        portable_round("mean", 6).alias("mean"),
        F.round("std", 6).alias("std"),
        "min",
        "max",
    )


# --------------------------------------------------------------------------
# q09 — exact grouped percentiles (SURVEY A7 generalized from approxQuantile).
# --------------------------------------------------------------------------
@register(
    "grouped_percentiles_price",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.00), 6) AS p00,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           round(quantile_cont(l_extendedprice, 1.00), 6) AS p100
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_percentiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = grouped_percentiles(
        table(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_extendedprice",
        [0.0, 0.25, 0.5, 0.75, 1.0],
    )
    return out.select(
        "l_returnflag",
        *[F.round(c, 6).alias(c) for c in ["p00", "p25", "p50", "p75", "p100"]],
    )


# --------------------------------------------------------------------------
# q10 — Pearson correlation per group (SURVEY A8: df.stat.corr distributed).
# --------------------------------------------------------------------------
@register(
    "grouped_correlation",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(corr(l_discount, l_tax), 6)           AS corr_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def grouped_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
        )
    )


# --------------------------------------------------------------------------
# q11 — top-k per group (rank window; deterministic tiebreak on the key).
# --------------------------------------------------------------------------
@register(
    "top_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = top_k_per_group(
        table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )
    return out.withColumn("rnk", F.col("rnk").cast("long"))


# --------------------------------------------------------------------------
# q12 — union + distinct (SURVEY U1/U4) over overlapping projections.
# --------------------------------------------------------------------------
@register(
    "union_distinct_events",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE value > 400
    UNION
    SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase' AND value > 350
    """,
)
def union_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = ev.filter(F.col("value") > 400)
    b = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 350))
    return a.unionByName(b).dropDuplicates()


# --------------------------------------------------------------------------
# q13 — dedup + deterministic global re-key (SURVEY U4/W1, merge_datasets.py
# :58-80) — scalable two-phase row_number, not a single-task global window.
# --------------------------------------------------------------------------
@register(
    "dedup_rekey_pairs",
    oracle="""
    SELECT CAST(row_number() OVER (
             ORDER BY user_id NULLS FIRST, event_type NULLS FIRST
           ) AS BIGINT) AS id,
           user_id, event_type
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
)
def dedup_rekey_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = table(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()
    out = global_row_number(pairs, ["user_id", "event_type"], id_col="id")
    return out.select("id", "user_id", "event_type")


# --------------------------------------------------------------------------
# q14 — rollup over the region/nation hierarchy (grouping-sets family;
# beyond the reference's flat groupBys, needed for OLAP completeness).
# --------------------------------------------------------------------------
@register(
    "customer_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS n_customers,
           (floor(CAST((avg(c_acctbal)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            portable_round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "avg_acctbal",
        )
    )


# --------------------------------------------------------------------------
# q15 — pivot: per-customer order-status counts (pivot/unpivot family).
# --------------------------------------------------------------------------
@register(
    "order_status_pivot",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
           round(sum(o_totalprice), 4) AS total_spend
    FROM orders
    GROUP BY o_custkey
    """,
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy("o_custkey")
        # explicit pivot values: no extra distinct-scan, deterministic columns
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total_spend")
    )
    return counts.join(spend, "o_custkey").select(
        "o_custkey",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        "total_spend",
    )


# --------------------------------------------------------------------------
# q40 — GROUPING SETS with a distinct aggregate: order counts, distinct
# customers and revenue at three grouping granularities in one pass.
# Completes the multi-dimensional agg family (rollup q14, pivot q15); the
# distinct agg forces Catalyst's two-phase expand+agg plan, which is the
# shape that matters at 100 TB (partial aggregation before the shuffle).
# --------------------------------------------------------------------------
@register(
    "priority_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus))
    """,
)
def priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # revenue as EXACT cents (sum of round(price·100) longs), not
    # round(sum(double), 4): the ALL grouping sets sum the whole table,
    # and at sf0.1 the ~1.2e10 sums already carry >1e-4 of
    # summation-order noise — the r10 sf0.1 sweep caught the two engines
    # disagreeing in the 4th decimal (DRIVERSIM_sf01_r10). Money sums
    # that must hash-match across engines use the scaled-integer form
    # (the customer_rolling_revenue recipe), which is order-independent
    # at ANY scale short of long overflow (9.2e16 cents).
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double") / 100.0
            ).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "n_customers",
            "revenue",
        )
    )


# --------------------------------------------------------------------------
# q45 — time-range window frame: per-customer trailing-30-day revenue
# (RANGE frame over event time — the windowed twin of the band join; the
# only frame type the registry didn't yet cover).
# --------------------------------------------------------------------------
@register(
    "customer_rolling_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0
             AS rev_30d
    FROM orders
    """,
)
def customer_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-cents frame sum: a double sum over a RANGE frame is summed in
    # engine-internal order (DuckDB: segment tree over a parallel sort;
    # Spark: frame scan order) — with tied o_orderdate peers the fold
    # order is tie-order-dependent and a low-bit flip could cross a
    # rounding boundary. Summing integer cents is exact on any order
    # (frame sums < 2^53 cents by construction), and the single final
    # /100.0 is the same IEEE op on both engines — bit-identical.
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # parquet NTZ timestamps won't cast straight to long; hop through
        # TIMESTAMP (session is pinned UTC, so epoch seconds are exact)
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / F.lit(100.0)).alias("rev_30d"),
    )


# --------------------------------------------------------------------------
# q46 — set operations: INTERSECT / EXCEPT on customer key sets (the two
# set ops the reference never used; union family is covered elsewhere).
# --------------------------------------------------------------------------
@register(
    "customer_status_setops",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def customer_status_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")

    def by_status(s: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == s).select("o_custkey")

    return by_status("O").intersect(by_status("F")).exceptAll(
        by_status("P")
    ).distinct()


# --------------------------------------------------------------------------
# q47 — outer-join family: customers LEFT OUTER orders (null-extending
# side preserved, count(order) = 0 for orderless customers) and nation
# customer-vs-supplier presence via FULL OUTER in one result.
# --------------------------------------------------------------------------
@register(
    "nation_presence_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_customers
      FROM customer GROUP BY 1),
    s AS (
      SELECT s_nationkey AS nk, count(*) AS n_suppliers
      FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def nation_presence_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(supp, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# q48 — left outer with null-extension aggregation: every customer's order
# count, INCLUDING zero-order customers (the null-preserving join shape a
# pure inner-join suite never exercises).
# --------------------------------------------------------------------------
@register(
    "customer_order_counts_outer",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 4) AS total_spend
    FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias(
                "total_spend"
            ),
        )
    )


# --------------------------------------------------------------------------
# q51 — robust-statistics aggregate family: exact median (interpolated),
# sample stddev/variance per group (the reference's describe() exposes
# stddev only; median/variance complete the family).
# --------------------------------------------------------------------------
@register(
    "order_price_robust_stats",
    oracle="""
    SELECT o_orderstatus,
           round(median(o_totalprice), 4) AS median_price,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           (floor(CAST((var_samp(o_totalprice)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS var_price,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def order_price_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        portable_round(F.var_samp("o_totalprice"), 4).alias("var_price"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# q52 — the SQL surface: the same engine through spark.sql() over temp
# views (dialect-portable subset — identical text runs on DuckDB as the
# oracle). Everything else in the registry uses the DataFrame API; this
# proves the Catalyst SQL front-end is a first-class entry point.
# --------------------------------------------------------------------------
_SQL_API_QUERY = """
SELECT n.n_name AS nation,
       count(DISTINCT c.c_custkey) AS n_customers,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus <> 'P'
GROUP BY n.n_name
HAVING count(DISTINCT c.c_custkey) > 5
"""


@register("sql_api_nation_revenue", oracle=_SQL_API_QUERY)
def sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("nation", "customer", "orders"):
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_SQL_API_QUERY)


# --------------------------------------------------------------------------
# q55 — customer distribution (TPC-H Q13 shape): left-join order counts
# per customer (zero included), then the distribution of those counts —
# a two-level aggregation over a null-extending join.
# --------------------------------------------------------------------------
@register(
    "customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q56 — order priority checking (TPC-H Q4 shape): semi join whose condition
# mixes an equality with an inequality across BOTH sides (late-shipment
# EXISTS) — Catalyst keeps the equi part as the join key and evaluates the
# inequality as a join residual, so this still hash-joins.
# --------------------------------------------------------------------------
@register(
    "late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # interval arithmetic, not date_add: date_add truncates to DATE and
    # would silently drop any time-of-day component of o_orderdate
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# q57 — important parts (TPC-H Q11 shape): per-part revenue filtered by a
# threshold derived from a WHOLE-TABLE aggregate — the scalar-subquery
# shape. Spark side: the 1-row global aggregate broadcast-cross-joins onto
# the grouped result (no driver collect, no second scan of the grouped
# data).
# --------------------------------------------------------------------------
_SHARE_THRESHOLD = 0.0005  # 0.05% of total revenue


@register(
    "important_parts",
    oracle=f"""
    SELECT l_partkey,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                              AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS part_revenue
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 >
           (SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS DOUBLE) / 10000.0
                   * {_SHARE_THRESHOLD}
            FROM lineitem)
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # exact 1e-4-scaled sums (r10 hardening): the HAVING threshold is a
    # WHOLE-TABLE sum, and an UNROUNDED noisy-double comparison against
    # it can flip borderline parts' membership between engines — both
    # sides now derive the compared doubles from identical longs
    rev = (
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
            ).cast("long")
        ).cast("double") / 10_000.0
    )
    per_part = li.groupBy("l_partkey").agg(
        rev.alias("__rev"),
    )
    total = li.agg((rev * _SHARE_THRESHOLD).alias("__threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__rev") > F.col("__threshold"))
        .select("l_partkey", F.round("__rev", 4).alias("part_revenue"))
    )


# --------------------------------------------------------------------------
# q58 — small-quantity revenue (TPC-H Q17 shape): each row compared against
# ITS OWN group's aggregate (correlated scalar subquery in SQL; in Spark a
# broadcast join of the per-part averages back onto lineitem — same one
# shuffle as the aggregate itself, no per-row subquery execution).
# --------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / 7.0, 4) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("__half_avg")
    )
    # no broadcast hint: the per-part aggregate scales with |parts|, so the
    # join strategy must stay AQE's choice (broadcast locally, SMJ at scale
    # where both sides are already partitioned on l_partkey)
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .agg(
            # exact cents then one deterministic /7 division: both engines
            # round the SAME double (r10 global-money-sum hardening)
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("double") / 100.0 / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# CUBE over (status, priority) — completes the grouping-sets family
# (ROLLUP / GROUPING SETS / PIVOT already registered). grouping() markers
# disambiguate real NULLs from subtotal rows, the OLAP-correct contract.
# --------------------------------------------------------------------------
@register(
    "order_cube_counts",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents (r10 sf0.1 sweep lesson): the CUBE's grand-total
            # row sums the whole orders table — see priority_grouping_sets
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double") / 100.0
            ).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------------------------------
# Linear-regression family (slope/intercept/r2) — per-user value drift
# over time, computed from EXACT integer moments rather than the
# engines' float regr_* aggregates.
#
# Why: regr_slope/intercept accumulate doubles in partition order, and
# with x = raw epoch-days (~19 700 ± 15) the normal equations cancel
# catastrophically — the round-4 fuzz sweep caught a 4th-decimal
# intercept flip between Spark and DuckDB on boundary-rich data. Here
# x is the µs OFFSET from the corpus min(ts) (exact BIGINT), y is
# integer cents, and the five sufficient statistics are summed in
# DECIMAL(38,0) / HUGEINT — exact on both engines — so the closed-form
# slope/intercept/r2 are a fixed sequence of IEEE ops on identical
# integers: bit-identical by construction, at any partitioning, on any
# data. Per-user magnitudes stay far inside 38 digits (n·Sxx ≲ 1e28 at
# a month of µs offsets). NULL values are excluded from the fit (the
# regr_* contract); slope is per-day in value units, intercept is the
# fitted value AT the corpus min(ts).
# --------------------------------------------------------------------------
_TREND_STATS = """
      SELECT user_id,
             count(*) AS n_events,
             count(x) AS n_fit,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(yc AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * yc) AS HUGEINT) AS sxy,
             CAST(sum(CAST(yc AS HUGEINT) * yc) AS HUGEINT) AS syy
"""


@register(
    "user_value_trend",
    oracle=f"""
    WITH t0 AS (SELECT min(ts) AS m FROM events),
    pts AS (
      SELECT user_id,
             CASE WHEN value IS NOT NULL
                  THEN epoch_us(ts) - epoch_us(t0.m) END AS x,
             CAST(round(value * 100) AS BIGINT) AS yc
      FROM events, t0),
    s AS ({_TREND_STATS} FROM pts GROUP BY user_id),
    d AS (
      SELECT user_id, n_events, n_fit,
             CAST(n_fit * sxy - sx * sy AS DOUBLE) AS num,
             CAST(n_fit * sxx - sx * sx AS DOUBLE) AS den,
             CAST(n_fit * syy - sy * sy AS DOUBLE) AS den2,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM s)
    SELECT user_id, n_events,
           CASE WHEN den = 0 THEN NULL ELSE
             {portable_round_sql('num / den * 86400000000.0 / 100.0', 6)}
           END AS slope_per_day,
           CASE WHEN den = 0 THEN NULL ELSE
             {portable_round_sql('(syd - num / den * sxd) / n_fit / 100.0', 4)}
           END AS intercept,
           CASE WHEN den = 0 OR den2 = 0 THEN NULL ELSE
             {portable_round_sql('num * num / (den * den2)', 6)} END AS r2
    FROM d
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # cast first: unix_micros rejects TIMESTAMP_NTZ (NTZ→LTZ is wall-clock
    # UTC under the pinned session TZ, matching the oracle's epoch_us)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t0 = ev.agg(F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("m"))
    pts = ev.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.when(F.col("value").isNotNull(), us - F.col("m")).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    s = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("x").alias("n_fit"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("yc")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("yc")).alias("sxy"),
        F.sum(dec("yc") * F.col("yc")).alias("syy"),
    )
    d = s.select(
        "user_id",
        "n_events",
        "n_fit",
        (dec("n_fit") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("num"),
        (dec("n_fit") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("den"),
        (dec("n_fit") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("den2"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    )
    # degenerate fits (den = 0: <2 distinct x per user) are NULL on both
    # engines — and the divisions must be GUARDED, not just masked:
    # Spark's ANSI mode raises DIVIDE_BY_ZERO eagerly inside when()
    fit = F.col("den") != 0
    slope_cu = F.col("num") / F.when(fit, F.col("den"))
    return d.select(
        "user_id",
        "n_events",
        F.when(
            fit, portable_round(slope_cu * 86400000000.0 / 100.0, 6)
        ).alias("slope_per_day"),
        F.when(
            fit,
            portable_round(
                (F.col("syd") - slope_cu * F.col("sxd"))
                / F.col("n_fit")
                / 100.0,
                4,
            ),
        ).alias("intercept"),
        F.when(
            fit & (F.col("den2") != 0),
            portable_round(
                F.col("num")
                * F.col("num")
                / F.when(F.col("den2") != 0, F.col("den") * F.col("den2")),
                6,
            ),
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# Skew-safe salted join in the oracle registry: event_type is a genuinely
# hot key (~5 values across all rows). The salt spreads each hot key over
# salt_buckets reducers; results must equal the plain join — the oracle IS
# the plain join.
# --------------------------------------------------------------------------
@register(
    "salted_event_type_weights",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type, length(event_type) AS w FROM events)
    SELECT e.event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(e.value * d.w * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def salted_event_type_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("w", F.length("event_type"))
    )
    joined = salted_join(ev, dim, on=["event_type"], salt_buckets=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact cents (value is an exact 2-decimal, w an int): the 5 hot
        # type groups sum ~2e5 rows each at sf0.1 (r10 hardening)
        (
            F.sum(F.round(F.col("value") * F.col("w") * 100).cast("long"))
            .cast("double") / 100.0
        ).alias("weighted_value"),
    )


# --------------------------------------------------------------------------
# q — footer-stats table profile: unfiltered min/max/count answered from
# parquet footer statistics via aggregate pushdown (v2 scan shows
# `PushedAggregation: [MIN(...), MAX(...), COUNT(*)]`; asserted in
# tests/test_operators.py). At 100 TB this reads metadata only — no data
# pages — which is THE way to profile a table before planning heavier work.
# Only numeric/date/bool columns push (timestamp min/max would silently
# fall back to a full scan, so it is kept out of this query).
# --------------------------------------------------------------------------
@register(
    "lineitem_footer_stats",
    oracle="""
    SELECT min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def lineitem_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.readers import read_parquet_stats_only

    li = read_parquet_stats_only(spark, f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
