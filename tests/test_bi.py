"""BI operator tests: hot-basket guard + scale-safe quartile/Pareto forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.plans.bi import copurchase_lift


def test_copurchase_hot_basket_guard_bounds_fanout(spark):
    """A pathological basket must NOT contribute C(B,2) pairs: the
    guard excludes it from pair generation (cap is part of the operator
    semantics, mirrored in the oracle SQL) while normal baskets still
    pair. (B=2000 here — C(2000,2)=2M pairs — because the unguarded
    control below actually materializes them; a 10k basket's 50M-pair
    hash aggregate OOMs a test-sized JVM, which is precisely the
    production failure the guard exists to prevent.)"""
    hot = [(999, i) for i in range(2_000)]
    # 5 normal baskets sharing parts 1-3 so (1,2),(1,3),(2,3) hit support
    normal = [(o, p) for o in range(5) for p in (1, 2, 3)]
    items = spark.createDataFrame(
        hot + normal, ["l_orderkey", "l_partkey"]
    ).repartition(8)

    out = copurchase_lift(items, min_support=3, max_basket_items=1000)
    rows = out.collect()
    got_pairs = {(r.p1, r.p2) for r in rows}
    assert got_pairs == {(1, 2), (1, 3), (2, 3)}
    # support counts exclude nothing: parts 1-3 appear in 5 normal orders
    # AND the hot order, so part_orders=6 feeds the lift denominator
    r12 = [r for r in rows if (r.p1, r.p2) == (1, 2)][0]
    assert r12.both_orders == 5  # hot basket contributed no pair
    # n_orders counts ALL orders (6): lift = 5*6/(6*6) = 0.833333
    assert abs(r12.lift - 0.833333) < 1e-6

    # without the guard the hot basket floods the pair space
    # count the raw unguarded PAIR fan-out (pre-support-filter): the hot
    # basket alone yields C(2000,2) = 1_999_000 pairs
    a = items.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("p2"))
    raw = a.join(b, "l_orderkey").filter(F.col("p1") < F.col("p2")).count()
    assert raw == 1_999_000 + 5 * 3


def test_copurchase_guard_noop_on_normal_baskets(spark, sf_dir):
    """On real testdata (baskets ~7 items) the guard must change nothing."""
    from big_data_occupancy_detection_spark.sources.readers import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.distinct()
    a = sorted(tuple(r) for r in copurchase_lift(items).collect())
    b = sorted(
        tuple(r)
        for r in copurchase_lift(items, max_basket_items=None).collect()
    )
    assert a == b


def test_survival_curve_hand_computed(spark, tmp_path):
    """Kaplan-Meier on a 4-customer cohort: at t=5, three at risk have
    duration 5 (two churned, one censored) and one survives past ->
    n_risk=4, S(5) = 1 - 2/4 = 0.5; the censored-only duration 100
    emits no row."""
    import datetime as dt

    from big_data_occupancy_detection_spark.plans.warehouse import (
        customer_survival_curve,
    )

    D = dt.datetime(2001, 8, 1)
    day = dt.timedelta(days=1)
    rows = []
    ok = [1]

    def order(cust, when):
        rows.append((ok[0], cust, when, 10.0, "O"))
        ok[0] += 1

    order(1, D - 100 * day); order(1, D - 95 * day)   # dur 5, churned
    order(2, D - 100 * day); order(2, D)              # dur 100, censored
    order(3, D - 200 * day); order(3, D - 195 * day)  # dur 5, churned
    order(4, D - 50 * day); order(4, D - 45 * day)    # dur 5, censored
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double, o_orderstatus string",
    )
    path = str(tmp_path / "orders.parquet")
    df.coalesce(1).write.parquet(path)

    import big_data_occupancy_detection_spark.plans.warehouse as wmod

    orig = wmod.table
    wmod.table = lambda s, d, name: (
        s.read.parquet(path) if name == "orders" else orig(s, d, name)
    )
    try:
        out = customer_survival_curve(spark, "unused").collect()
    finally:
        wmod.table = orig
    assert len(out) == 1
    r = out[0]
    assert (r.t_days, r.n_risk, r.n_events, r.survival) == (5, 4, 2, 0.5)
