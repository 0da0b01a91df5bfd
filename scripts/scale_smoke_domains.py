"""100x scale smoke for the round-8 domain-curation family (PERF.md).

Replication axis: documents replicated R-fold with REKEYED doc_id and
unchanged source/lang — the domain universe stays fixed (60 registrable
domains) while docs-per-domain grows R-fold, which is exactly the skew
shape web corpora have and the one that stresses each operator's scale
path: the dedup census's fingerprint grain, the blocklist's
no-corpus-shuffle contract, and the balanced sample's two-phase top-k
(a per-domain plain window would funnel ~8k-row domains into single
tasks at R=100; at real scale those are 1e9-row head domains).

Usage: python scripts/scale_smoke_domains.py [R] [op ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402

from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"

OPS = [
    "domain_dedup_rate",
    "domain_blocklist_filter",
    "domain_balanced_sample",
    "domain_mirror_overlap",
    "url_canonical_collapse",
]


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or OPS
    spark = get_session(
        app_name=f"scale_smoke_domains_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g", "spark.ui.enabled": "true"},
    )
    docs = table(spark, SF_DIR, "documents")
    docs_rep = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
    ).select(
        (F.col("doc_id") * r + F.col("__k")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )

    import big_data_occupancy_detection_spark.plans.curation as CU

    orig = CU.table
    CU.table = lambda s, d, name, _o=orig: (
        docs_rep if name == "documents" else _o(s, d, name)
    )
    from big_data_occupancy_detection_spark.plans import REGISTRY

    print(json.dumps({"replication": r, "docs": docs_rep.count()}), flush=True)
    try:
        for name in ops:
            r0, w0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
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
    finally:
        CU.table = orig
    spark.stop()


if __name__ == "__main__":
    main()
