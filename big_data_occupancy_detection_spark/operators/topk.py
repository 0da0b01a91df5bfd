"""Top-K per group — ranking window, partition-parallel.

The reference only ever does global ``orderBy + show(n)`` (SURVEY.md §2.6);
the per-group form is the scale-relevant generalization: the window is
partitioned by the group key, so each group ranks independently in parallel
(one shuffle on the key, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows of each group under a deterministic order.

    ``order_by`` should end with a unique tiebreaker column for
    reproducible results (engine-portable hashing depends on it).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


# Skew note (round 8, plan-audited): this shape is ALREADY two-phase in
# Spark ≥3.5 — the InsertWindowGroupLimit rule plants a
# ``WindowGroupLimit Partial`` BELOW the exchange, so every map task
# pre-prunes to k rows per group before any byte shuffles, and a hot
# group (a 1e9-doc head web domain) lands at most k·input_partitions
# survivor rows on its reduce task. A hand-rolled salted two-phase
# variant (rank within (group, spark_partition_id()), re-rank survivors)
# was built and measured for round 8's domain_balanced_sample, then
# DELETED: the optimizer's partial limit gives the identical pruning
# with one exchange fewer. Requirement for the rewrite to fire: the
# ``filter(rank <= k)`` must sit directly on the row_number/rank/
# dense_rank column, which this operator guarantees.
