"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of a (small, broadcast) query set
  against the full corpus. The corpus side never shuffles: queries are
  broadcast, the dot products run scan-parallel, and the per-query ranking
  window partitions by query id. This is the correctness baseline.
- ``lsh_bucketed_topk``: random-hyperplane LSH scale path — vectors hash to
  a sign-bit bucket; search touches only the query's bucket. Planes are
  derived from the portable md5 hash family so bucketing is deterministic
  and reproducible across engines/runs.

All vector math is double-precision ``zip_with``/``aggregate`` Catalyst
expressions (JVM codegen, no Python in the hot path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector_fns import cosine_similarity
from ..operators.partitioning import repartition_for_compute

LSH_PLANES = 8  # 2^8 = 256 buckets


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Ranking is on the cosine rounded to 9 decimals with the corpus id as
    tiebreaker — fully deterministic and engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = repartition_for_compute(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    )
    cos = F.round(cosine_similarity("qvec", "cvec"), 9)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cos", 6).alias("cos"), "rnk")
    )


def near_pairs_threshold(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs (a < b) with cosine >= threshold — embedding near-dup.

    O(n²) form for correctness checking; the LSH bucketed variant below is
    the scale path (bucket first, pair only within buckets).
    """
    a = repartition_for_compute(
        emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    )
    b = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    cos = cosine_similarity("a_vec", "b_vec")
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos", F.round(cos, 6))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def _plane_component(plane: int, dim_index) -> F.Column:
    """Deterministic pseudo-random plane component in [-1, 1): derived from
    the portable hash of (plane, dim) so any engine can rebuild the planes."""
    from ..functions.text_fns import md5_hash64

    h = md5_hash64(F.concat_ws("|", F.lit(f"plane{plane}"), dim_index.cast("string")))
    return (h % F.lit(2000001)).cast("double") / F.lit(1000000.0) - F.lit(1.0)


def with_lsh_bucket(
    emb: DataFrame, planes: int = LSH_PLANES, vec_col: str = "embedding"
) -> DataFrame:
    """Add an integer ``bucket`` column: sign bits of <v, plane_p> dot products."""
    def _projector(p: int):
        # closure helper (a p=p default arg would break PySpark's lambda
        # arity inference for higher-order functions)
        return lambda v, i: v.cast("double") * _plane_component(p, i)

    bits = []
    for p in range(planes):
        prods = F.transform(F.col(vec_col), _projector(p))
        dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return emb.withColumn("bucket", reduce(lambda x, y: x + y, bits))


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = LSH_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only candidates in the query's LSH bucket.

    At scale the corpus is hash-partitioned by bucket, so each query's
    search is a single-partition probe instead of a full scan. Recall is
    tuned by ``planes`` (fewer planes → bigger buckets → higher recall).
    """
    c = with_lsh_bucket(
        repartition_for_compute(
            corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
        ),
        planes,
        "cvec",
    )
    q = with_lsh_bucket(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        planes,
        "qvec",
    )
    cos = F.round(cosine_similarity("qvec", "cvec"), 9)
    pairs = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cos", 6).alias("cos"), "rnk")
    )
