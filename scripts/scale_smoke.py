"""100x dedup scale smoke (union-replicated corpus, measured for PERF.md).

Replicates the sf0.1 ``documents`` table R times with rekeyed ids
(``doc_id*R + k``), so every base doc becomes an R-way exact-duplicate
group — the shape of crawl data — WITHOUT materializing the corpus on
disk: the replicas come from ``explode(sequence(0, R-1))`` over the 5k
base rows, so the scan stays tiny and the operators see the full row
count.

Measures the staged dedup family (exact-dedup-first), which is the
100 TB design: pair enumeration and signatures touch only exact-group
REPRESENTATIVES; the corpus-scale work is one fingerprint shuffle plus
an output-linear expansion.

Usage::

    python scripts/scale_smoke.py [R] [op ...]

    R    replication factor (default 100 -> 500k docs)
    op   minhash_staged | clusters_staged | minhash_direct (default both
         staged forms)

Shuffle totals are read from the local UI REST API (loopback), summed
over all completed stages of the measured job only.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, ".")

from big_data_occupancy_detection_spark.ext import dedup
from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark: SparkSession, r: int) -> DataFrame:
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
    ).select((F.col("doc_id") * r + F.col("__k")).alias("doc_id"), "text")


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages."""
    base = spark.sparkContext.uiWebUrl
    if base is None:  # UI disabled: skip shuffle accounting
        return (0, 0)
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as f:
        stages = json.load(f)
    done = [s for s in stages if s["status"] == "COMPLETE"]
    return (
        sum(s["shuffleReadBytes"] for s in done),
        sum(s["shuffleWriteBytes"] for s in done),
    )


def measure(spark: SparkSession, name: str, build) -> None:
    # build() is deferred: exact_tagged eagerly localCheckpoints during
    # DataFrame CONSTRUCTION, so construction must sit inside the clock.
    r0, w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    r1, w1 = shuffle_totals(spark)
    print(
        json.dumps(
            {
                "op": name,
                "wall_s": round(wall, 2),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or ["minhash_staged", "clusters_staged"]
    spark = get_session(
        app_name=f"scale_smoke_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    docs = replicated_docs(spark, r)
    n = docs.count()
    print(json.dumps({"replication": r, "rows": n}), flush=True)
    if "minhash_staged" in ops:
        measure(
            spark,
            "minhash_lsh_pairs_staged",
            lambda: dedup.minhash_lsh_pairs_staged(docs, threshold=0.5),
        )
    if "clusters_staged" in ops:
        measure(
            spark,
            "near_dup_clusters_staged",
            lambda: dedup.near_dup_clusters_staged(docs, threshold=0.5),
        )
    if "minhash_direct" in ops:
        measure(
            spark,
            "minhash_lsh_pairs_direct",
            lambda: dedup.minhash_lsh_pairs(docs, threshold=0.5),
        )
    spark.stop()


if __name__ == "__main__":
    main()
