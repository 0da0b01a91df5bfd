"""IVF-PQ probe-selection smoke: driver-loop vs distributed (PERF.md r7).

Verdict r6 "What's wrong #1": `ivfpq_topk_from_index` selected each
query's probe clusters in a SERIAL driver loop — O(|batch| × n_coarse ×
dim) boxed-float ops (~160M Python ops at the 10k cap with 256 lists ×
64 dims). Round 7 moves the selection executor-side (`_probe_select`:
one broadcast coarse row, JVM fold dots, array_sort top-n — the r6 LUT
template), bit-identical probe sets gated by
tests/test_similarity_index.py::test_ivfpq_probe_select_matches_driver_loop.

This smoke serves a 10k-query batch (replicated sf0.01 embeddings)
through both paths IN SEPARATE PROCESSES (ru_maxrss is a high-water
mark) and reports wall + driver Python maxRSS delta around the serve.

Usage::

    python scripts/smoke_ivfpq_probe.py            # orchestrates both
    python scripts/smoke_ivfpq_probe.py old|new    # one path (child)
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

N_QUERIES = 10_000
N_COARSE = 256
N_PROBES = 8
K = 5
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
INDEX_DIR = os.path.join(tempfile.gettempdir(), "smoke_ivfpq_probe_index")


def _serve_old(spark, path, queries, k, n_probes):
    """The retired pre-r7 serve shape: collect the batch, run the serial
    driver probe loop, ship probes via createDataFrame."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from big_data_occupancy_detection_spark.ext import pq_index as pqx

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cents = pqx.load_codebooks(spark, path, meta["n_sub"])
    coarse = sorted(
        (int(r["cid"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{path}/coarse").collect()
    )
    queries = (
        queries.select("vec_id", "embedding")
        .limit(pqx.MAX_QUERY_BATCH + 1)
        .localCheckpoint(eager=True)
    )
    q_rows = queries.collect()
    probe_rows = pqx._probe_rows_driver(
        q_rows, coarse, n_probes, "vec_id", "embedding"
    )
    qid_type = queries.schema["vec_id"].dataType
    probe_df = spark.createDataFrame(
        probe_rows,
        StructType(
            [
                StructField("qid", qid_type),
                StructField("cluster", IntegerType()),
                StructField("bias", DoubleType()),
            ]
        ),
    )
    all_probed = sorted({row[1] for row in probe_rows})
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cluster").isin(all_probed)
    )
    return pqx._serve_codes(
        spark, path, codes, cents, meta["n_sub"], meta["d_sub"], queries,
        k, pqx.PQ_SHORTLIST, "vec_id", "embedding", probe_df=probe_df,
    )


def child(mode: str) -> None:
    from pyspark.sql import functions as F

    from big_data_occupancy_detection_spark.ext import pq_index as pqx
    from big_data_occupancy_detection_spark.session import get_session

    spark = get_session(
        app_name=f"ivfpq_probe_smoke_{mode}", master="local[8]"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if not os.path.exists(os.path.join(INDEX_DIR, "meta.json")):
        pqx.build_ivfpq_index(
            emb, INDEX_DIR, n_coarse=N_COARSE, residual=True
        )
    base = emb.count()
    rep = (base + N_QUERIES - 1) // base
    queries = (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("__k"),
        )
        .select(
            (F.col("vec_id") * rep + F.col("__k")).alias("vec_id"),
            "embedding",
        )
        .limit(N_QUERIES)
        .localCheckpoint(eager=True)
    )
    assert queries.count() == N_QUERIES
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    if mode == "old":
        out = _serve_old(spark, INDEX_DIR, queries, K, N_PROBES)
    else:
        out = pqx.ivfpq_topk_from_index(
            spark, INDEX_DIR, queries, k=K, n_probes=N_PROBES
        )
    n = out.count()
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        json.dumps(
            {
                "mode": mode,
                "wall_s": round(wall, 1),
                "rows": n,
                "driver_maxrss_delta_mb": round((rss1 - rss0) / 1024.0, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1:
        child(sys.argv[1])
        return
    for mode in ("old", "new"):
        subprocess.run(
            [sys.executable, __file__, mode], check=True
        )


if __name__ == "__main__":
    main()
