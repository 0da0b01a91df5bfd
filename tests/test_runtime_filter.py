"""Bloom runtime filter: a selective non-broadcast dim join must inject
a bloom_filter_agg on the build side and a might-contain prefilter on
the probe side, killing non-matching fact rows before the join shuffle.

This is the shuffle-volume saver for selective star joins too big to
broadcast at 100 TB. The application-side scan threshold defaults to
10 GB — correct in production (a bloom pass isn't worth it on small
scans), so sf-scale tests must zero it to see the mechanism.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _with_conf(spark, conf):
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_runtime_filter_injected(spark, sf_dir):
    old = _with_conf(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        got = j.collect()[0]["n"]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
    finally:
        _restore(spark, old)
    # and the runtime filter changed nothing semantically
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    expected = li2.join(o2, li2.l_orderkey == o2.o_orderkey).count()
    assert got == expected
