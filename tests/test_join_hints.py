"""Join strategy hints: the user-facing lever when the optimizer's
size estimates are wrong (a common 100 TB reality — e.g. a filtered dim
whose selectivity Catalyst can't see). Pins that each hint actually
flips the physical strategy."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_hints_select_physical_strategy(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")

    j = o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey)
    assert "BroadcastHashJoin" in _plan(j)

    j = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    assert "SortMergeJoin" in _plan(j)

    j = o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey)
    assert "ShuffledHashJoin" in _plan(j)


def test_sql_hint_syntax(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("__jh_o")
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView("__jh_c")
    j = spark.sql(
        """
        SELECT /*+ MERGE(c) */ count(*) AS n
        FROM __jh_o o JOIN __jh_c c ON o.o_custkey = c.c_custkey
        """
    )
    assert "SortMergeJoin" in _plan(j)
    n = j.collect()[0]["n"]
    assert n == spark.table("__jh_o").join(
        spark.table("__jh_c"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).count()
