"""Persisted IVF index: the build/serve split for embedding search.

``ivf_topk`` / ``ivf_topk_vectorized`` fit + assign on every call —
right for one-shot analytics, wrong for serving, where the corpus is
static and query batches arrive forever. This module materializes the
expensive half once:

- ``build_ivf_index`` writes the centroid table and the assigned corpus
  as parquet **partitioned by cluster id** — the disk layout IS the
  inverted file. Hive-style partition dirs mean a probe of p clusters
  reads exactly p directories: Spark's partition pruning turns the
  probe mask into skipped splits before any IO.
- ``ivf_topk_from_index`` answers a query batch from the index: collect
  the k·dim centroid table, pick each query's ``n_probes`` closest
  lists, scan ONLY those partitions with the two-level vectorized top-k
  (batch-local numpy top-k, then a global window over the survivors).

At 100 TB the build is one pass (fit + assign + partitioned write) and
every subsequent batch costs |probed partitions| of IO with zero
shuffle on the corpus side. Re-index on drift by rebuilding to a new
path and swapping readers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import IVF_CENTROIDS, IVF_ITERS, IVF_PROBES
from .similarity_vec import (
    _centroid_matrix,
    _collect_queries,
    _local_then_global_topk,
    assign_nearest_vectorized,
    fit_centroids_vectorized,
)


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    n_iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One-pass index build: vectorized k-means fit, argmax assignment,
    cluster-partitioned parquet write + a tiny centroid table."""
    spark = emb.sparkSession
    cent_rows = fit_centroids_vectorized(emb, n_centroids, n_iters, id_col, vec_col)
    spark.createDataFrame(
        [(c, [float(x) for x in v]) for c, v in cent_rows],
        schema="cid int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = assign_nearest_vectorized(emb, cent_rows, id_col, vec_col)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/corpus")
    )


def load_centroids(spark: SparkSession, path: str) -> list[tuple[int, list[float]]]:
    return sorted(
        (int(r["cid"]), list(r["centroid"]))
        for r in spark.read.parquet(f"{path}/centroids").collect()
    )


def ivf_topk_from_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probes: int = IVF_PROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a query batch from a built index. The corpus read carries a
    ``cluster IN (probed)`` predicate that prunes whole partition dirs
    (verify with ``.explain``: PartitionFilters on the scan), then the
    scan-parallel two-level top-k runs with a per-query probe mask —
    the corpus side never shuffles."""
    cent_rows = load_centroids(spark, path)
    C = _centroid_matrix(cent_rows)
    q_ids, Q = _collect_queries(queries, id_col, vec_col)
    probes = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :n_probes]
    probe_clusters = {int(q): set(map(int, p)) for q, p in zip(q_ids, probes)}
    all_probed = sorted(set().union(*probe_clusters.values()))
    corpus = spark.read.parquet(f"{path}/corpus").filter(
        F.col("cluster").isin(all_probed)
    )
    return _local_then_global_topk(
        corpus, q_ids, Q, k, vec_col, id_col, probe_clusters
    )
