"""Bucketed-table co-located join: the pre-shuffle amortization path."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.sources.readers import table
from big_data_occupancy_detection_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", str(tmp_path / "orders_b"), ["o_orderkey"], 8
    )
    write_bucketed(
        lineitem, "lineitem_b", str(tmp_path / "lineitem_b"), ["l_orderkey"], 8
    )
    try:
        joined = (
            spark.table("lineitem_b")
            .hint("merge")
            .join(
                spark.table("orders_b").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce a shuffle: both sides arrive
        # pre-bucketed on the join key (the aggregate after it may shuffle)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # sanity: result matches the plain-table join
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        a = {r.o_orderpriority: round(r.rev, 2) for r in joined.collect()}
        b = {r.o_orderpriority: round(r.rev, 2) for r in plain.collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
