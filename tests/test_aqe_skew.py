"""AQE skew-join splitting: a hot key in a sort-merge join must be
split into multiple task-chunks at runtime (OptimizeSkewedJoin) — the
third runtime optimization pinned by this suite (with DPP in
`test_dpp.py` and the Bloom runtime filter in `test_runtime_filter.py`).

The manual salting operator (`operators/relational.py:salted_join`,
oracle `salted_event_type_weights`) remains for paths AQE can't see
(pre-shuffle aggregation keys, non-join skew); this pins that Spark's
runtime re-plan handles the plain-join case.

Gotcha pinned here: skew detection reads MAP OUTPUT BYTES, post
column-pruning and compression. A query that prunes the wide columns
before the join (e.g. count(*)) shuffles only the constant join key —
which compresses to nothing, so the "hot" partition never crosses the
byte threshold and no split happens. Skew repro/diagnosis must keep
the real payload flowing through the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _conf(spark, kv):
    old = {}
    for k, v in kv.items():
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


def _skewed_join(spark):
    # 200k rows of key 0 vs ~200 rows of keys 1..9, with an
    # incompressible 32-byte payload that must survive the join
    left = spark.range(0, 201_800).select(
        F.when(F.col("id") < 200_000, F.lit(0))
        .otherwise((F.col("id") % 9) + 1)
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return left.join(right, "k")


SKEW_CONF = {
    # thresholds sized for a ~6 MB hot partition (defaults are 256MB-scale)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join(spark):
    old = _conf(spark, SKEW_CONF)
    try:
        j = _skewed_join(spark).agg(
            F.count(F.lit(1)).alias("n"), F.max("payload").alias("mp")
        )
        assert j.collect()[0]["n"] == 201_800
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan  # the AQEShuffleRead carries the split
    finally:
        _restore(spark, old)


def test_column_pruned_shuffle_defeats_skew_detection(spark):
    """Negative twin: count(*) prunes the payload, the shuffled key-only
    stream compresses below the byte threshold, and NO split happens —
    the diagnosis trap documented in the module docstring."""
    old = _conf(spark, SKEW_CONF)
    try:
        j = _skewed_join(spark).agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 201_800
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan
    finally:
        _restore(spark, old)
