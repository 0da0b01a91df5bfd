"""Residual-vs-plain IVF-PQ recall at realistic scale (r6 verdict #4).

The pytest gate (tests/test_similarity_index.py::
test_ivfpq_residual_recall_at_tight_shortlist) runs at sf0.001 with 12
queries; this script re-measures recall@5 against brute-force cosine
ground truth on the sf0.01 (500-vector) and sf0.1 (2000-vector)
embedding corpora with >=100 queries, sweeping the ADC shortlist. The
published table lives in PERF.md (round-7).

Usage: python scripts/recall_ivfpq.py [sf_dir ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from big_data_occupancy_detection_spark.ext import pq_index as pqx
from big_data_occupancy_detection_spark.ext import similarity as sim
from big_data_occupancy_detection_spark.session import get_local_session
from big_data_occupancy_detection_spark.sources.readers import table

K = 5
N_QUERIES = 120
N_PROBES = 8
SHORTLISTS = [8, 20, 50, 100, 200]

sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
spark = get_local_session("ivfpq-recall")
spark.sparkContext.setLogLevel("ERROR")

for sf_dir in sf_dirs:
    emb = table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.filter(f"vec_id < {N_QUERIES}").localCheckpoint(eager=True)
    nq = queries.count()
    truth = {
        (r["qid"], r["vec_id"])
        for r in sim.brute_force_topk(emb, queries, k=K).collect()
    }
    work = tempfile.mkdtemp(prefix="ivfpq_recall_")
    out = {"sf_dir": sf_dir, "n_vectors": n, "n_queries": nq, "k": K,
           "n_probes": N_PROBES, "recall": {}}
    try:
        for kind, residual in (("plain", False), ("residual", True)):
            path = f"{work}/{kind}"
            t0 = time.time()
            pqx.build_ivfpq_index(emb, path, residual=residual)
            build_s = time.time() - t0
            rec = {}
            for s in SHORTLISTS:
                t0 = time.time()
                got = pqx.ivfpq_topk_from_index(
                    spark, path, queries, k=K, n_probes=N_PROBES, shortlist=s
                ).collect()
                assert len(got) == K * nq, (kind, s, len(got))
                rec[s] = {
                    "recall": round(
                        len({(r["qid"], r["vec_id"]) for r in got} & truth)
                        / len(truth),
                        4,
                    ),
                    "serve_s": round(time.time() - t0, 2),
                }
            out["recall"][kind] = {"build_s": round(build_s, 1), "by_shortlist": rec}
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out), flush=True)
spark.stop()
