"""Dynamic partition pruning: a selective dimension filter must prune
fact partitions at runtime through the join, not after a full scan.

This is the mechanism that makes star joins over date/type-partitioned
100 TB facts read only the qualifying partition directories; the static
twin (literal filters → PartitionFilters) is asserted in
`test_similarity_index.py`.

Gotcha pinned here: Catalyst's DPP insertion requires the filtering
side's predicate to be "likely selective" (EqualTo/In/Like on a
column); a bare boolean attribute filter (``.filter("is_flag")``) does
NOT qualify and silently disables DPP — dimension filters that should
prune a partitioned fact must be written as explicit comparisons.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    fact_dir = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    ev.write.partitionBy("event_type").parquet(fact_dir)

    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "segment",
            F.when(F.col("event_type") == "purchase", "conv").otherwise("other"),
        )
    )
    dim_dir = str(tmp_path / "type_dim")
    dim.write.parquet(dim_dir)

    fact = spark.read.parquet(fact_dir)
    d = spark.read.parquet(dim_dir).filter(F.col("segment") == "conv")
    joined = fact.join(d, "event_type").agg(F.count("*").alias("n"))

    # the answer matches the un-partitioned formulation...
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert joined.collect()[0]["n"] == expected
    # ...and the (final, post-AQE) plan carries the runtime pruning
    # subquery on the fact scan's partition filters
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_boolean_attribute_filter_disables_dpp(spark, sf_dir, tmp_path):
    """The negative twin: the same join with a bare boolean attribute
    filter does not get DPP — pinning the selectivity-heuristic gotcha
    so a refactor to `.filter("is_conv")` style fails loudly here."""
    fact_dir = str(tmp_path / "events_by_type_b")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    ev.write.partitionBy("event_type").parquet(fact_dir)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("is_conv", F.col("event_type") == "purchase")
    )
    dim_dir = str(tmp_path / "type_dim_b")
    dim.write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    d = spark.read.parquet(dim_dir).filter("is_conv")
    joined = fact.join(d, "event_type").agg(F.count("*").alias("n"))
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" not in plan.lower()
