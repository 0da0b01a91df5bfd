"""100x scale smoke for the round-7 late additions (PERF.md).

Three corpora, three scale axes:

- ``doc_lang_centroid_confusion``: union-replicated documents (rekeyed
  doc_id, text unchanged) — token volume grows linearly with R; the
  classifier is counts-join-agg, so wall should scale ~linearly and the
  confusion matrix stays |langs|².
- ``embedding_matryoshka_topk``: jitter-replicated embeddings (the
  scale_smoke_ann recipe) — corpus grows R-fold while the query batch
  stays 10, so both brute passes are bandwidth-bound scans; the
  truncated pass should read ~1/4 of the full pass's vector volume.
- ``part_sorted_neighborhood_pairs``: suffix-replicated part names
  (`name || ' rK'`) — the NAME UNIVERSE grows R-fold, stressing the
  global_row_number range exchange and the N×W band fan-out, which is
  the operator's actual scale knob.

The two new orders-grain queries (theilsen, ks_drift) ride in
scale_smoke_bi.py with the rest of the warehouse family.

Usage: python scripts/scale_smoke_r7b.py [R] [op ...]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402
from scale_smoke_ann import replicated_emb  # noqa: E402

from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"

OPS = [
    "doc_lang_centroid_confusion",
    "embedding_matryoshka_topk",
    "part_sorted_neighborhood_pairs",
]


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or OPS
    spark = get_session(
        app_name=f"scale_smoke_r7b_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
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
    # pin the jittered replicas like scale_smoke_ann does — the jitter is
    # an xxhash64-per-element transform, and without materialization the
    # cross-join would re-evaluate it per PAIR (measured: 469 s vs ~60 s)
    emb_rep = replicated_emb(spark, r).localCheckpoint(eager=True)
    part = table(spark, SF_DIR, "part")
    part_rep = part.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k")
    ).select(
        (F.col("p_partkey") * r + F.col("__k")).alias("p_partkey"),
        F.concat_ws(" ", "p_name", F.concat(F.lit("r"), F.col("__k"))).alias(
            "p_name"
        ),
        *[c for c in part.columns if c not in ("p_partkey", "p_name")],
    )
    reps = {"documents": docs_rep, "embeddings": emb_rep, "part": part_rep}

    import big_data_occupancy_detection_spark.plans.bi as BI
    import big_data_occupancy_detection_spark.plans.textops as TO

    orig = TO.table
    patch = lambda s, d, name, _o=orig: (
        reps[name] if name in reps else _o(s, d, name)
    )
    TO.table = patch
    BI.table = patch
    from big_data_occupancy_detection_spark.plans import REGISTRY

    sizes = {n: reps[n].count() for n in reps}
    print(json.dumps({"replication": r, **sizes}), flush=True)
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
        TO.table = orig
        BI.table = orig
    spark.stop()


if __name__ == "__main__":
    main()
