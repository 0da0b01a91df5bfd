"""Extended TPC-H-shape join/subquery plans (Q7-Q22 shapes).

The reference has no joins at all (SURVEY.md §2.3, ``be/api_fast.py:173``
correlates request/response outside Spark); the engine's join family was
seeded in ``plans/relational.py`` (Q1/Q3/Q4/Q5/Q6/Q11/Q13/Q17 shapes).
This module completes the canonical decision-support shapes the oracle star
schema supports: multi-nation disjunctive joins (Q7), market-share
conditional ratios (Q8), LIKE-filtered profit rollups (Q9), top-k revenue
reporting (Q10), CASE-aggregated join census (Q12), promo ratio (Q14),
scalar-subquery max selection (Q15), distinct-agg with NOT-IN blacklist
(Q16), IN-subquery over a grouped HAVING (Q18), disjunctive multi-predicate
join (Q19), nested semi joins (Q20), EXISTS+NOT-EXISTS exclusivity (Q21),
and anti-join with a global-average threshold (Q22).

Scale notes: every dimension (region/nation/supplier/part at these row
ratios) gets an explicit ``broadcast()``; fact-fact joins (lineitem⋈orders)
shuffle on the join key and are AQE-planned; scalar subqueries become 1-row
broadcast cross joins (never a driver collect); EXISTS/NOT EXISTS become
left-semi/left-anti joins with equi keys plus non-equi residuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import table
from ..functions.rounding import portable_round
from .registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# q59 — volume shipping (TPC-H Q7 shape): revenue between a nation PAIR in
# both directions, by ship year. The disjunctive nation-pair predicate runs
# after the dimension joins; both nation-annotated dims are broadcast-sized.
# Scale: supplier⋈nation is a tiny broadcast; the only big shuffle is
# lineitem⋈orders on the orderkey; year() is a scan-side projection.
# --------------------------------------------------------------------------
@register(
    "volume_shipping",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        # pre-filter to the pair's nations so the broadcast carries only
        # relevant suppliers (predicate pushdown through the dim join)
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # join order matters: the nation filter keeps ~2/25 of customers, so
    # pruning orders through the (broadcast) filtered customers FIRST shrinks
    # the fact-fact join's small side ~12×; AQE can then broadcast it under
    # the lineitem scan instead of shuffling all of lineitem
    pair_orders = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.join(pair_orders, li.l_orderkey == pair_orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q60 — national market share (TPC-H Q8 shape): one supplier-nation's share
# of STANDARD-part revenue sold to ASIA customers, per order year — the
# conditional-ratio aggregate (sum(CASE)/sum) over a 7-table star join.
# --------------------------------------------------------------------------
@register(
    "national_market_share",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD')
    SELECT o_year,
           (floor(CAST((sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    asia_cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = _rev()
    # prune BOTH fact inputs before the fact-fact join: part filter (1/6)
    # semi-prunes lineitem, region filter (1/5 of nations) semi-prunes
    # orders — the orderkey join then moves a fraction of either table
    asia_orders = orders.join(
        asia_cust, orders.o_custkey == asia_cust.c_custkey, "left_semi"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(asia_orders, li.l_orderkey == asia_orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            portable_round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# q61 — product-type profit (TPC-H Q9 shape): profit on 'red%' parts by
# supplier nation and order year; the LIKE filter prunes part BEFORE its
# broadcast so the fact join only sees matching partkeys.
# --------------------------------------------------------------------------
@register(
    "product_profit_by_nation",
    oracle="""
    SELECT ns.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    red_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(_rev()), 4).alias("profit"))
    )


# --------------------------------------------------------------------------
# q62 — returned-item reporting (TPC-H Q10 shape): top-20 customers by
# revenue on returned items in one order-year; deterministic tiebreak on
# the customer key (LIMIT queries must totally order).
# --------------------------------------------------------------------------
@register(
    "returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = table(spark, sf_dir, "customer").join(
        F.broadcast(table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q63 — priority census by line status (TPC-H Q12 shape): orders⋈lineitem
# with CASE-bucketed counts of urgent vs non-urgent order priorities per
# line status, over one ship year.
# --------------------------------------------------------------------------
@register(
    "urgent_linestatus_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def urgent_linestatus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q64 — promotion revenue share (TPC-H Q14 shape): conditional-sum ratio
# over a part-dimension join restricted to one ship month.
# --------------------------------------------------------------------------
@register(
    "promo_revenue",
    oracle="""
    SELECT (floor(CAST((100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            portable_round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_share")
        )
    )


# --------------------------------------------------------------------------
# q65 — top supplier (TPC-H Q15 shape): per-supplier quarterly revenue,
# select the max via a 1-row broadcast cross join (the scalar-subquery
# pattern — no driver collect, no second scan of the grouped data).
# Revenue is rounded BEFORE the max comparison on both engines so the
# equality predicate compares identical doubles.
# --------------------------------------------------------------------------
@register(
    "top_supplier",
    oracle="""
    WITH sr AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, sr.total_rev
    FROM supplier s JOIN sr ON sr.l_suppkey = s.s_suppkey
    WHERE sr.total_rev = (SELECT max(total_rev) FROM sr)
    """,
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    sr = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 4).alias("total_rev"))
    best = sr.agg(F.max("total_rev").alias("__best"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sr.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("__best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


# --------------------------------------------------------------------------
# q66 — brand/type/size supplier census (TPC-H Q16 shape): distinct-supplier
# counts with NOT-IN blacklist (left-anti join) and an IN-list size filter.
# --------------------------------------------------------------------------
@register(
    "brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
    GROUP BY 1, 2, 3
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    blacklist = (
        table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 500).select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        F.broadcast(blacklist), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q67 — large-volume orders (TPC-H Q18 shape): IN-subquery over a grouped
# HAVING — orders whose total quantity exceeds a threshold, re-joined to
# customer and lineitem for the report. The HAVING subquery is a left-semi
# join against the aggregated key set (shuffles once on l_orderkey; AQE
# broadcasts the small filtered key set for the semi probe).
# --------------------------------------------------------------------------
@register(
    "large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY 1 HAVING sum(l_quantity) > 300)
    GROUP BY 1, 2, 3
    """,
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big_keys, orders.o_orderkey == big_keys.l_orderkey, "left_semi")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# q68 — disjunctive multi-predicate join (TPC-H Q19 shape): OR of three
# conjunctive (brand, size, quantity) bands. Catalyst extracts the common
# p_partkey equi-key; the disjunction stays a join residual — still a hash
# join, not a nested loop.
# --------------------------------------------------------------------------
@register(
    "disjunctive_brand_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 5 AND 15)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 15 AND 25)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 25 AND 35)
    """,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 15)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(15, 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(25, 35)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            # exact 1e-4-scaled integers: a GLOBAL money sum (r10
            # global-money-sum hardening, see plans.relational)
            (
                F.sum(F.round(_rev() * 10_000).cast("long")).cast("double")
                / 10_000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q69 — bulk suppliers of red parts (TPC-H Q20 shape): nested semi joins —
# suppliers IN (shippers of parts IN (red parts) with bulk total quantity).
# Both inner key sets stay distributed; the final probe is a broadcast semi.
# --------------------------------------------------------------------------
@register(
    "red_part_bulk_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey HAVING sum(l_quantity) > 2000)
    """,
)
def red_part_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    bulk = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 2000)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    return supp.join(
        bulk, supp.s_suppkey == bulk.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# q70 — exclusive heavy supplier (TPC-H Q21 shape): per finished order, the
# supplier whose item was heavy (qty>45) while SOME other supplier shared
# the order and NO other supplier was heavy — EXISTS plus NOT EXISTS with a
# non-equi (suppkey<>) residual on both probes.
# Scale: the probe sides are distinct (orderkey, suppkey) pair sets, each
# shuffled once on orderkey; the residual inequality is evaluated in the
# hash-join probe, never a cartesian.
# --------------------------------------------------------------------------
@register(
    "exclusive_heavy_supplier_orders",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_quantity > 45
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_quantity > 45)
    GROUP BY s.s_name
    """,
)
def exclusive_heavy_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    finished = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = (
        li.filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .join(finished, F.col("l_orderkey") == finished.o_orderkey, "left_semi")
    )
    pairs_all = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).dropDuplicates()
    pairs_heavy = (
        li.filter(F.col("l_quantity") > 45)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .dropDuplicates()
    )
    survivors = l1.join(
        pairs_all,
        (l1.l_orderkey == pairs_all.ok) & (l1.l_suppkey != pairs_all.sk),
        "left_semi",
    ).join(
        pairs_heavy,
        (l1.l_orderkey == pairs_heavy.ok) & (l1.l_suppkey != pairs_heavy.sk),
        "left_anti",
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        survivors.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# q71 — inactive rich customers (TPC-H Q22 shape): customers above the
# global positive-balance average with no RECENT orders (none since
# 1999-01-01 — every customer has SOME order in this data), grouped by a
# substring country code carved from the customer name. Global average is
# a 1-row broadcast; NOT EXISTS is a left-anti join.
# --------------------------------------------------------------------------
@register(
    "inactive_rich_customers",
    oracle="""
    SELECT substring(c.c_name, 10, 2) AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                               AS DOUBLE) / 100.0 / count(*)
                         FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    # exact-cents average (r10 hardening): the global avg is an
    # UNROUNDED comparison threshold — both engines must derive the same
    # double or a borderline customer flips membership
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("double") / 100.0 / F.count(F.lit(1))
        ).alias("__avg")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q78 — correlated lateral subquery (Spark 4 DataFrame.lateralJoin): per
# customer, the top-2 orders by price via a LIMIT-ed subquery referencing
# the outer row (Column.outer()). Catalyst rewrites the domain join; the
# oracle uses SQL LATERAL directly. Deterministic via (price DESC, key).
# --------------------------------------------------------------------------
@register(
    "lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2) t
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders")
    return cust.lateralJoin(
        orders.where(F.col("o_custkey") == F.col("c_custkey").outer())
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(2)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q79 — null-safe equality join (<=> / IS NOT DISTINCT FROM): two aggregates
# keyed by a deliberately NULLable key (nullif) joined so the NULL group
# matches itself — plain equality would silently drop it.
# --------------------------------------------------------------------------
@register(
    "nullsafe_event_type_join",
    oracle="""
    WITH a AS (
      SELECT nullif(event_type, 'view') AS etype, count(*) AS n_events
      FROM events GROUP BY 1),
    b AS (
      SELECT nullif(event_type, 'view') AS etype, (floor(CAST((avg(value)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS avg_value
      FROM events GROUP BY 1)
    SELECT a.etype, a.n_events, b.avg_value
    FROM a JOIN b ON a.etype IS NOT DISTINCT FROM b.etype
    """,
)
def nullsafe_event_type_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn(
        "etype", F.nullif(F.col("event_type"), F.lit("view"))
    )
    a = ev.groupBy("etype").agg(F.count(F.lit(1)).alias("n_events"))
    b = ev.groupBy("etype").agg(portable_round(F.avg("value"), 6).alias("avg_value"))
    return a.join(b, a["etype"].eqNullSafe(b["etype"])).select(
        a["etype"].alias("etype"), "n_events", "avg_value"
    )
