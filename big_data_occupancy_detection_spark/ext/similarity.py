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


# ------------------------------------------------------------------ IVF ANN

IVF_CENTROIDS = 16
IVF_ITERS = 2
IVF_PROBES = 4


def _elementwise_mean(assigned: DataFrame, cluster_col: str, vec_col: str) -> DataFrame:
    """Per-cluster element-wise mean of array vectors, shuffle-parallel.

    posexplode → (cluster, dim, value) → per-(cluster, dim) average →
    rebuild ordered arrays. Never materializes a cluster's member list in
    one task, so cluster size is unbounded (the 100 TB-safe formulation;
    ``collect_list`` of vectors per cluster would not be).
    """
    exploded = assigned.select(
        F.col(cluster_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    dim_means = exploded.groupBy(cluster_col, "dim").agg(
        F.avg(F.col("val").cast("double")).alias("mean_val")
    )
    return dim_means.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean_val"))),
            lambda s: s.getField("mean_val"),
        ).alias("centroid")
    )


def _nearest_centroid(vec_col: str, centroids: list[tuple[int, list[float]]]):
    """Column expr: id of the max-dot-product centroid (deterministic
    tie-break on centroid id). Centroid literals are compiled into the
    plan, so assignment is a pure scan-parallel projection.

    Implemented as array_sort over (−dot, cid) structs — linear expression
    size; an incremental when/otherwise argmax would nest the running best
    twice per step and grow the expression tree exponentially.
    """
    from ..functions.vector_fns import dot

    entries = [
        F.struct(
            (-dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in vec]))).alias(
                "nd"
            ),
            F.lit(cid).alias("cid"),
        )
        for cid, vec in centroids
    ]
    return F.array_sort(F.array(*entries))[0].getField("cid")


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    n_iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical-k-means centroids as driver-side literals.

    Seeding: the ``n_centroids`` vectors with the smallest portable
    md5-hash of their id (a reproducible pseudo-random sample — no RNG
    state, same pick on any engine). Lloyd iterations assign by dot
    product against L2-normalized vectors and re-average element-wise;
    every step is a DataFrame op, only the k centroid vectors themselves
    ever reach the driver (k·dim doubles — constant in corpus size).
    """
    from ..functions.text_fns import md5_hash64
    from ..functions.vector_fns import l2_norm

    normed = emb.select(
        F.col(id_col).alias("vid"),
        F.zip_with(
            F.col(vec_col),
            F.array_repeat(l2_norm(vec_col), F.size(vec_col)),
            lambda x, n: x.cast("double") / n,
        ).alias("nvec"),
    )
    seeds = (
        normed.withColumn("__h", md5_hash64(F.col("vid").cast("string")))
        .orderBy("__h", "vid")
        .limit(n_centroids)
        .collect()
    )
    centroids = [(i, list(r.nvec)) for i, r in enumerate(seeds)]
    for _ in range(n_iters):
        assigned = normed.withColumn(
            "cluster", _nearest_centroid("nvec", centroids)
        )
        means = _elementwise_mean(assigned, "cluster", "nvec").collect()
        centroids = sorted((r.cluster, list(r.centroid)) for r in means)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = IVF_PROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into ``n_centroids``
    inverted lists; each query probes its ``n_probes`` closest lists and
    ranks only those candidates.

    Scale shape: corpus assignment is a scan-parallel projection (centroid
    literals compiled into the plan, no shuffle); the probe is an equi-join
    on cluster id — the corpus can be persisted bucketed by cluster so
    repeated query batches skip the shuffle entirely. Search cost drops by
    ~``n_centroids / n_probes`` vs brute force; recall is tuned by
    ``n_probes``.
    """
    cents = ivf_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    c = repartition_for_compute(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"))
    ).withColumn("cluster", _nearest_centroid("cvec", cents))

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probe_sets = []
    for cid, vec in cents:
        from ..functions.vector_fns import dot

        probe_sets.append(
            F.struct(
                dot(F.col("qvec"), F.array(*[F.lit(float(x)) for x in vec])).alias("d"),
                F.lit(cid).alias("cid"),
            )
        )
    probes = F.slice(F.reverse(F.array_sort(F.array(*probe_sets))), 1, n_probes)
    q = q.withColumn(
        "cluster", F.explode(F.transform(probes, lambda s: s.getField("cid")))
    )

    cos = F.round(cosine_similarity("qvec", "cvec"), 9)
    pairs = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", F.round("cos", 6).alias("cos"), "rnk")
    )
