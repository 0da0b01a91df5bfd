"""100x text-analytics scale smoke (union-replicated documents, PERF.md).

Replicates the sf0.1 ``documents`` table R times with rekeyed ids — the
text payload per row is unchanged, so token volume scales linearly with
R (crawl-corpus shape) — and measures the corpus-statistics operators
added in round 3:

- ``doc_tfidf_top_terms``: tf/df counts + idf join + per-doc rank
- ``doc_bigram_logprob``: bigram LM fit + per-doc scoring
- ``pmi_top_cooccurrence``: capped-vocabulary co-occurrence

These are counts-join-agg pipelines: their cost should scale ~linearly
in corpus tokens (no pair blowup — PMI's pair space is capped at
C(100,2) by construction), which is exactly what this smoke checks.

Usage::

    python scripts/scale_smoke_text.py [R] [op ...]

    R    replication factor (default 100 -> 500k docs)
    op   tfidf | bigram | pmi | spans | despan | bloom | repet (default: the round-3 trio)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from scale_smoke import shuffle_totals  # noqa: E402

from big_data_occupancy_detection_spark.plans import analytics as A
from big_data_occupancy_detection_spark.session import get_session
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = sys.argv[2:] or ["tfidf", "bigram", "pmi"]
    spark = get_session(
        app_name=f"scale_smoke_text_{r}x",
        master="local[32]",
        extra_conf={"spark.driver.memory": "48g", "spark.ui.enabled": "true"},
    )
    docs = table(spark, SF_DIR, "documents")
    rep = (
        docs.select(
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
            F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("__k"),
        )
        .select(
            (F.col("doc_id") * r + F.col("__k")).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .localCheckpoint(eager=True)
    )
    n = rep.count()
    print(json.dumps({"replication": r, "rows": n}), flush=True)
    rep.createOrReplaceTempView("__rep_docs")

    # monkey-point the plan functions at the replicated frame: they take
    # (spark, sf_dir) and read via table(); route through a patched table
    import big_data_occupancy_detection_spark.plans.analytics as mod
    import big_data_occupancy_detection_spark.plans.curation as cmod
    import big_data_occupancy_detection_spark.plans.textops as tmod

    orig_table = mod.table
    patched = lambda s, d, name: rep if name == "documents" else orig_table(s, d, name)
    mod.table = patched
    orig_ttable = tmod.table
    tmod.table = patched
    orig_ctable = cmod.table
    cmod.table = patched
    try:
        targets = {
            "tfidf": ("doc_tfidf_top_terms", A.doc_tfidf_top_terms),
            "bigram": ("doc_bigram_logprob", A.doc_bigram_logprob),
            "pmi": ("pmi_top_cooccurrence", A.pmi_top_cooccurrence),
            # round 5: exact-substring spans + removal — under R-way
            # replication EVERY doc is an exact duplicate, so every
            # position is a duplicated gram and the surgery runs at its
            # worst case (all docs fully cut). Stresses the gram
            # explode, global dup filter, interval merge, and fold.
            "spans": ("doc_repeated_spans", tmod.doc_repeated_spans),
            "despan": ("doc_despanned_text", tmod.doc_despanned_text),
            # round 9: keep-first policy — same worst case, plus the
            # winner min(struct) riding the duplicate-filter join; under
            # R-way replication rep-0 docs survive intact and every
            # later replica is fully cut
            "despan1": (
                "doc_despanned_keep_first", tmod.doc_despanned_keep_first,
            ),
            # round 5: within-doc repetition censuses (line/2-gram/5-gram
            # explode+groupBy) — per-doc work, so wall should scale
            # linearly with docs and shuffle with token volume
            "repet": ("doc_repetition_features", tmod.doc_repetition_features),
            # round 5b: DSIR importance weights (one token pass to the
            # (doc, bucket, count) grain, O(dim) broadcast back) and the
            # cross-doc shingle-novelty census (two long-keyed shuffles)
            # — both should be wall-linear in corpus tokens
            "dsir": ("dsir_importance_weights", cmod.dsir_importance_weights),
            # composed curation -> temperature mixture -> resample; the
            # R-way replicated corpus collapses to reps in the exact
            # stage, so this stresses the staged-dedup front plus the
            # manifest tail
            "manifest": ("training_mix_manifest", tmod.training_mix_manifest),
            "novelty": ("doc_shingle_novelty", tmod.doc_shingle_novelty),
            "datacard": ("corpus_datacard", cmod.corpus_datacard),
            # round 6: fingerprint-grain snapshot diff — full-outer join
            # of (key, md5, len) slims, payloads never cross the exchange
            "diff": ("corpus_snapshot_diff", cmod.corpus_snapshot_diff),
        }
        for op in ops:
            if op == "bloom":
                # R-way replicated CONTENT keeps the fingerprint key space
                # flat, so the bloom smoke scales the key space itself:
                # R/100 x 500k DISTINCT keys, filter sized keys/3 words,
                # delta half-seen/half-new. Evidence for the claim that
                # build shuffle carries words (partitions x n_words
                # partials), never the key stream.
                from big_data_occupancy_detection_spark.ext.sketches import (
                    bloom_build,
                    bloom_contains,
                )

                n_keys = 500_000 * r // 100
                n_words = max(1024, n_keys // 3)
                mk = lambda lo, hi: spark.range(lo, hi).select(
                    F.concat(F.lit("k-"), F.col("id")).alias("k")
                )
                corpus = mk(0, n_keys)
                # the seen half can never exceed the corpus (small R)
                half = min(25_000, n_keys // 2)
                delta = mk(n_keys - half, n_keys + half)
                r0, w0 = shuffle_totals(spark)
                t0 = time.perf_counter()
                bloom = bloom_build(
                    corpus, "k", n_words=n_words
                ).localCheckpoint(eager=True)
                build_wall = time.perf_counter() - t0
                t1 = time.perf_counter()
                row = (
                    bloom_contains(bloom, delta, "k", n_words=n_words)
                    .agg(
                        F.sum(F.col("might_contain").cast("int")).alias("c"),
                        F.count(F.lit(1)).alias("n"),
                    )
                    .collect()[0]
                )
                probe_wall = time.perf_counter() - t1
                r1, w1 = shuffle_totals(spark)
                assert row["c"] >= half  # never a false negative
                print(
                    json.dumps(
                        {
                            "op": "bloom_build+probe",
                            "keys": n_keys,
                            "n_words": n_words,
                            "build_wall_s": round(build_wall, 2),
                            "probe_wall_s": round(probe_wall, 2),
                            "candidates": int(row["c"]),
                            "probed": int(row["n"]),
                            "false_pos": int(row["c"]) - half,
                            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
                            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                        }
                    ),
                    flush=True,
                )
                continue
            name, fn = targets[op]
            r0, w0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            out = fn(spark, SF_DIR)
            out.write.format("noop").mode("overwrite").save()
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
        mod.table = orig_table
        tmod.table = orig_ttable
        cmod.table = orig_ctable
    spark.stop()


if __name__ == "__main__":
    main()
