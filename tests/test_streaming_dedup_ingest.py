"""Streaming incremental near-dedup: foreachBatch shingle-index ingest
(batch-vs-stream equality across a restart, idempotent replay)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.streaming.dedup_ingest import (
    apply_near_dedup_batch,
    near_dedup_ingest_sink,
    read_decisions,
)

SCHEMA = "doc_id long, text string"

# three word-shingle (n=3) families; threshold 0.5
_BASE = "the quick brown fox jumps over the lazy dog again and again"
_NEAR = "the quick brown fox jumps over the lazy dog again and often"
_OTHER = "completely different content about spark execution plans here"
_THIRD = "yet another unrelated document that talks about parquet files"

BATCHES = [
    # batch 0: 1 kept, 3 = intra-batch near-dup of 1, 2 kept
    [(1, _BASE), (2, _OTHER), (3, _NEAR)],
    # batch 1: 4 = corpus near-dup of 1, 5 kept
    [(4, _NEAR), (5, _THIRD)],
    # batch 2 (after restart): 6 = corpus dup of 2, 7 kept
    [(6, _OTHER), (7, "some genuinely fresh text with no overlap at all")],
]


def _write_batch(src_dir, i, rows):
    with open(os.path.join(src_dir, f"b{i}.json"), "w") as f:
        f.write(
            "\n".join(
                json.dumps({"doc_id": d, "text": t}) for d, t in rows
            )
        )


def _stream(spark, src_dir, index_dir, ckpt):
    docs = spark.readStream.format("json").schema(SCHEMA).load(str(src_dir))
    return near_dedup_ingest_sink(docs, str(index_dir), str(ckpt))


def _reference_decisions(spark, batches):
    """Independent batch twin: corpus kept as RAW TEXT and re-checked per
    batch with cross_corpus_near_dups (a different code path than the
    stream's persisted hashed-shingle index), intra-batch via the same
    min-parent rule applied on a batch-only corpus of smaller ids."""
    from big_data_occupancy_detection_spark.ext.dedup import (
        cross_corpus_near_dups,
    )

    corpus_rows: list[tuple[int, str]] = []
    out: dict[int, tuple] = {}
    for rows in batches:
        new = spark.createDataFrame(rows, SCHEMA)
        if corpus_rows:
            corp = spark.createDataFrame(corpus_rows, SCHEMA)
            dec = {
                r.doc_id: r
                for r in cross_corpus_near_dups(corp, new).collect()
            }
        else:
            dec = {
                d: type("R", (), {"doc_id": d, "dup_of": None, "keep": True})
                for d, _ in rows
            }
        # intra-batch min-parent among corpus survivors
        surv = [(d, t) for d, t in rows if dec[d].keep]
        intra: dict[int, int] = {}
        for i, (d, t) in enumerate(surv):
            smaller = [x for x in surv[:i]]
            if smaller:
                parents = cross_corpus_near_dups(
                    spark.createDataFrame(smaller, SCHEMA),
                    spark.createDataFrame([(d, t)], SCHEMA),
                ).collect()
                if parents and not parents[0].keep:
                    intra[d] = parents[0].dup_of
        for d, _ in rows:
            if not dec[d].keep:
                out[d] = (dec[d].dup_of, False)
            elif d in intra:
                out[d] = (intra[d], False)
            else:
                out[d] = (None, True)
        corpus_rows += [(d, t) for d, t in rows if out[d][1]]
    return out, {d for d, _ in corpus_rows}


def test_stream_matches_batch_twin_across_restart(spark, tmp_path):
    src = tmp_path / "docs_src"
    src.mkdir()
    index = tmp_path / "ndd_index"
    ckpt = tmp_path / "ndd_ckpt"

    # batches 0 and 1 before the restart, each drained separately so the
    # micro-batch boundaries are deterministic
    q = _stream(spark, src, index, ckpt)
    try:
        for i in range(2):
            _write_batch(src, i, BATCHES[i])
            time.sleep(0.1)
            q.processAllAvailable()
    finally:
        q.stop()

    # restart: same checkpoint picks up batch 2
    _write_batch(src, 2, BATCHES[2])
    q2 = _stream(spark, src, index, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        r.doc_id: (r.dup_of, r.keep)
        for r in read_decisions(spark, str(index)).collect()
    }
    want, want_kept = _reference_decisions(spark, BATCHES)
    assert got == want
    # the persisted index holds exactly the accepted docs
    from big_data_occupancy_detection_spark.streaming.dedup_ingest import (
        _corpus_index,
    )

    kept_ids = {
        r.doc_id for r in _corpus_index(spark, str(index)).collect()
    }
    assert kept_ids == want_kept
    # sanity on the planted structure itself
    assert got[3] == (1, False)  # intra-batch near-dup
    assert got[4] == (1, False)  # corpus near-dup across batches
    assert got[6] == (2, False)  # corpus dup across the RESTART
    assert got[1][1] and got[2][1] and got[5][1] and got[7][1]


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    index = tmp_path / "replay_index"
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    apply_near_dedup_batch(b0, 0, str(index))
    before = sorted(
        tuple(r) for r in read_decisions(spark, str(index)).collect()
    )
    # replay the SAME batch id with different content: committed -> no-op
    poison = spark.createDataFrame([(99, _BASE)], SCHEMA)
    apply_near_dedup_batch(poison, 0, str(index))
    after = sorted(
        tuple(r) for r in read_decisions(spark, str(index)).collect()
    )
    assert after == before
    # an UNcommitted replay (marker removed) overwrites cleanly
    os.remove(os.path.join(str(index), "_commits", "0"))
    apply_near_dedup_batch(b0, 0, str(index))
    assert (
        sorted(tuple(r) for r in read_decisions(spark, str(index)).collect())
        == before
    )
