"""100x similarity/ANN scale smoke (union-replicated embeddings, PERF.md).

Replicates the sf0.1 ``embeddings`` table R times with rekeyed ids and a
tiny deterministic per-(row, dim) jitter (~1e-3 additive, so replicas are
distinct rows at cosine ≈ 1 to their base vector — the near-duplicate
flood shape ANN/semantic-dedup must survive) WITHOUT materializing the
corpus on disk: replicas come from ``explode(sequence(0, R-1))`` over the
2k base rows.

Measured per op: wall, shuffle read/write bytes (UI REST API, measured
job only), and — for the top-k paths — recall@5 against the brute-force
ground truth computed on the SAME replicated corpus.

Usage::

    python scripts/scale_smoke_ann.py [R] [op ...]

    R    replication factor (default 100 -> 200k vectors)
    op   brute | lsh | ivf | ivf_index | pq_index | ivfpq_index | semdedup |
         brute_vec | ivf_vec |
         semdedup_vec (default: all; brute is both the exact-baseline
         wall measurement and the recall oracle, so recall for the
         approximate ops needs it in the op list). The ``*_vec`` ops are
         the Arrow-vectorized fast paths (ext/similarity_vec.py) —
         identical distributed shape, numpy matmul inner loops.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402  (sibling module)

from big_data_occupancy_detection_spark.ext import similarity as SIM
from big_data_occupancy_detection_spark.ext import similarity_vec as SIMV
from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"
N_QUERIES = 20
K = 5
IVF_INDEX_ITERS = 2
# skew-guard sizing for the 200k-row corpus: 16 k-means clusters average
# ~12.5k members; cap 100 with up to 8 split bits bounds the pair stage at
# ~10M cosines instead of the unguarded 2.5B
SEMDEDUP_CAP = 100
SEMDEDUP_SPLIT_PLANES = 8


def replicated_emb(spark: SparkSession, r: int) -> DataFrame:
    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rep = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k"),
    ).select((F.col("vec_id") * r + F.col("__k")).alias("vec_id"), "embedding")
    # deterministic per-(row, dim) jitter in [-1e-3, 1e-3): replicas become
    # distinct vectors at cosine ≈ 1 to the base (values are ~N(0,1), so
    # the relative perturbation is ~1e-3) — near-dup flood, not bit-dups
    jitter = lambda x, i: x.cast("double") + (
        F.pmod(
            F.xxhash64(F.concat_ws("|", F.col("vec_id"), i.cast("string"))),
            F.lit(2001),
        ).cast("double")
        - 1000.0
    ) / 1000000.0
    return rep.select(
        "vec_id",
        F.transform(F.col("embedding"), jitter).alias("embedding"),
    )


def measure(spark, name, build, extra=None):
    r0, w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    rows = build().collect()
    wall = time.perf_counter() - t0
    r1, w1 = shuffle_totals(spark)
    rec = {
        "op": name,
        "wall_s": round(wall, 2),
        "rows": len(rows),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)
    return rows


def topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def recall(exact_rows, approx_rows):
    exact, approx = topk_sets(exact_rows), topk_sets(approx_rows)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return round(hits / total, 3) if total else None


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or [
        "brute", "brute_vec", "lsh", "ivf", "ivf_vec", "semdedup", "semdedup_vec",
    ]
    spark = get_session(
        app_name=f"scale_smoke_ann_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    emb = replicated_emb(spark, r).localCheckpoint(eager=True)
    n = emb.count()
    print(json.dumps({"replication": r, "rows": n}), flush=True)
    # 20 queries: replica 0 of base ids 0..19
    queries = emb.filter(F.col("vec_id") % r == 0).filter(
        F.col("vec_id") < 20 * r
    )

    exact_rows = None
    if "brute" in ops:
        exact_rows = measure(
            spark,
            "brute_force_topk",
            lambda: SIM.brute_force_topk(emb, queries, k=K),
        )
    if "brute_vec" in ops:
        rows = measure(
            spark,
            "brute_force_topk_vectorized",
            lambda: SIMV.brute_force_topk_vectorized(emb, queries, k=K),
        )
        if exact_rows is not None:
            print(json.dumps({"op": "brute_force_topk_vectorized",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "lsh" in ops:
        rows = measure(
            spark,
            "lsh_bucketed_topk",
            lambda: SIM.lsh_bucketed_topk(emb, queries, k=K, plane_dim=64),
        )
        if exact_rows is not None:
            print(json.dumps({"op": "lsh_bucketed_topk",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "ivf" in ops:
        rows = measure(
            spark,
            "ivf_topk",
            lambda: SIM.ivf_topk(emb, queries, k=K, n_centroids=64, n_probes=4),
        )
        if exact_rows is not None:
            print(json.dumps({"op": "ivf_topk",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "ivf_vec" in ops:
        rows = measure(
            spark,
            "ivf_topk_vectorized",
            lambda: SIMV.ivf_topk_vectorized(
                emb, queries, k=K, n_centroids=64, n_probes=4
            ),
        )
        if exact_rows is not None:
            print(json.dumps({"op": "ivf_topk_vectorized",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "outliers" in ops:
        # per-cluster outlier census: fit+assign (the IVF front) plus a
        # cluster-partitioned ranking window; n_centroids scales with the
        # corpus (sqrt-ish, as for IVF) so window partitions stay bounded
        measure(
            spark,
            "cluster_outliers",
            lambda: SIM.cluster_outliers(emb, n_centroids=64),
        )
    if "outliers_vec" in ops:
        measure(
            spark,
            "cluster_outliers_vectorized",
            lambda: SIMV.cluster_outliers_vectorized(emb, n_centroids=64),
        )
    if "semdedup" in ops:
        rows = measure(
            spark,
            "semantic_dedup_capped",
            lambda: SIM.semantic_dedup(
                emb,
                threshold=0.95,
                max_cluster_size=SEMDEDUP_CAP,
                split_planes=SEMDEDUP_SPLIT_PLANES,
                plane_dim=64,
            ),
            extra={"cap": SEMDEDUP_CAP},
        )
        kept = sum(1 for x in rows if x.keep)
        print(json.dumps({"op": "semantic_dedup_capped", "kept": kept,
                          "drop_rate": round(1 - kept / len(rows), 4)}), flush=True)
    if "semdedup_vec" in ops:
        rows = measure(
            spark,
            "semantic_dedup_vectorized",
            lambda: SIMV.semantic_dedup_vectorized(
                emb,
                threshold=0.95,
                max_cluster_size=SEMDEDUP_CAP,
                split_planes=SEMDEDUP_SPLIT_PLANES,
                plane_dim=64,
            ),
            extra={"cap": SEMDEDUP_CAP},
        )
        kept = sum(1 for x in rows if x.keep)
        print(json.dumps({"op": "semantic_dedup_vectorized", "kept": kept,
                          "drop_rate": round(1 - kept / len(rows), 4)}), flush=True)
    if "ivf_index" in ops:
        # build/serve split: the index build is one pass paid once; every
        # query batch afterwards costs only the PROBED partition dirs
        import tempfile

        from big_data_occupancy_detection_spark.ext import (
            similarity_index as SIX,
        )

        idx = tempfile.mkdtemp(prefix="ivf_idx_") + "/idx"
        t0 = time.perf_counter()
        SIX.build_ivf_index(emb, idx, n_centroids=64, n_iters=IVF_INDEX_ITERS)
        print(json.dumps({"op": "ivf_index_build",
                          "wall_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
        # serve: time a warm probe-only batch and count pruned partitions
        serve = lambda: SIX.ivf_topk_from_index(
            spark, idx, queries, k=K, n_probes=4
        )
        plan = serve()._jdf.queryExecution().executedPlan().toString()
        import re as _re

        # small probe sets print as `cluster IN (..)`, large ones as
        # `cluster INSET ..` (inSetConversionThreshold)
        m = _re.search(
            r"PartitionFilters: \[[^\]]*cluster[^\]]*?(?:INSET|IN)\s*\(?([^)\]]*)",
            plan,
        )
        probed = len(m.group(1).split(",")) if m else None
        rows = measure(spark, "ivf_topk_from_index", serve,
                       extra={"partitions_probed": probed,
                              "partitions_total": 64,
                              "partition_filter_in_plan": bool(m)})
        if exact_rows is not None:
            print(json.dumps({"op": "ivf_topk_from_index",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "pq_index" in ops:
        # build-once/serve-many PQ: build pays the 8-subspace fit + code
        # assignment; serve scans ONLY the int8 code table (broadcast
        # LUT literal) and reads raw vectors just for the shortlist ids
        import tempfile

        from big_data_occupancy_detection_spark.ext import pq_index as PQX

        idx = tempfile.mkdtemp(prefix="pq_idx_") + "/idx"
        t0 = time.perf_counter()
        PQX.build_pq_index(emb, idx)
        print(json.dumps({"op": "pq_index_build",
                          "wall_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
        serve = lambda: PQX.pq_topk_from_index(spark, idx, queries, k=K)
        rows = measure(spark, "pq_topk_from_index", serve)
        plan = serve()._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({"op": "pq_topk_from_index",
                          "rerank_id_filter_pushed": "In(vec_id" in plan}),
              flush=True)
        if exact_rows is not None:
            print(json.dumps({"op": "pq_topk_from_index",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    if "ivfpq_index" in ops:
        # composite: coarse partition pruning AND compressed codes —
        # serve reads only the probed partition dirs of the int8 table
        import tempfile

        from big_data_occupancy_detection_spark.ext import pq_index as PQX

        idx = tempfile.mkdtemp(prefix="ivfpq_idx_") + "/idx"
        t0 = time.perf_counter()
        PQX.build_ivfpq_index(emb, idx, n_coarse=64)
        print(json.dumps({"op": "ivfpq_index_build",
                          "wall_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
        serve = lambda: PQX.ivfpq_topk_from_index(
            spark, idx, queries, k=K, n_probes=8
        )
        rows = measure(spark, "ivfpq_topk_from_index", serve)
        if exact_rows is not None:
            print(json.dumps({"op": "ivfpq_topk_from_index",
                              "recall_at_5": recall(exact_rows, rows)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
