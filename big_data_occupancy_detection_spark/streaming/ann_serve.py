"""Streaming ANN serving over the persisted PQ index: query batches
arrive as a stream; each micro-batch is answered from the build-once
index and written to an idempotent per-batch output directory.

The streaming face of ``ext.pq_index.pq_topk_from_index`` — the index
is the heavy, slowly-changing artifact; queries are the high-rate
stream. foreachBatch + overwrite-per-batch-dir gives exactly-once
output: a replayed batch id rewrites the same directory with the same
deterministic results (the serve path has no RNG and the index is
immutable between maintenance jobs).

Pairs with ``ext.pq_index.append_to_pq_index`` for corpus growth:
appends between micro-batches are picked up by the next batch's serve
scan automatically (the reader lists the codes dataset per batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..ext.pq_index import pq_topk_from_index


def read_served_results(spark, out_dir: str) -> DataFrame | None:
    """(batch_id, qid, vec_id, score, rnk) across all served batches."""
    import glob
    from functools import reduce

    from pyspark.sql import functions as F

    paths = sorted(glob.glob(os.path.join(out_dir, "batch-*")))
    if not paths:
        return None
    return reduce(
        DataFrame.unionByName,
        (
            spark.read.parquet(p).withColumn(
                "batch_id", F.lit(int(p.rsplit("-", 1)[1]))
            )
            for p in paths
        ),
    )


def ann_serve_sink(
    queries_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Start the checkpointed serve query. Each micro-batch of
    (id_col, vec_col) rows is answered with ``pq_topk_from_index`` and
    written to ``out_dir/batch-<id>`` (overwrite → idempotent replay)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        result = pq_topk_from_index(
            spark, index_path, batch_df, k=k, id_col=id_col, vec_col=vec_col
        )
        result.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch-{batch_id}")
        )

    return (
        queries_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
