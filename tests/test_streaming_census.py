"""Streaming incremental corpus census: batch-vs-stream equality across
a restart, idempotent replay of committed/uncommitted batches."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext.curation import datacard_from_docs
from big_data_occupancy_detection_spark.functions.text_fns import tokens
from big_data_occupancy_detection_spark.streaming.census import (
    apply_census_batch,
    census_sink,
    read_census_datacard,
    read_census_partials,
)

SCHEMA = "doc_id long, lang string, source string, n_chars long, text string"

BATCHES = [
    [
        (1, "en", "web", 11, "alpha beta gamma"),
        (2, "en", "web", 7, "alpha beta"),
        (3, "de", "books", 20, "eins zwei drei vier"),
    ],
    [
        (4, "en", "books", 9, "delta epsilon"),
        (5, "fr", "web", 15, "un deux trois"),
    ],
    # after restart
    [
        (6, "de", "web", 4, "null"),
        (7, "en", "web", 30, "zeta eta theta iota kappa"),
    ],
]


def _rows(batches):
    return [r for b in batches for r in b]


def _write_batch(src_dir, i, rows):
    with open(os.path.join(src_dir, f"b{i}.json"), "w") as f:
        f.write(
            "\n".join(
                json.dumps(
                    {
                        "doc_id": d,
                        "lang": lang,
                        "source": src,
                        "n_chars": nc,
                        "text": t,
                    }
                )
                for d, lang, src, nc, t in rows
            )
        )


def _stream(spark, src_dir, census_dir, ckpt):
    docs = spark.readStream.format("json").schema(SCHEMA).load(str(src_dir))
    return census_sink(docs, str(census_dir), str(ckpt))


def _expected_datacard(spark, rows):
    docs = spark.createDataFrame(rows, SCHEMA).select(
        "lang", "source", F.size(tokens("text")).alias("n_tok"), "n_chars"
    )
    return sorted(tuple(r) for r in datacard_from_docs(docs).collect())


def test_streamed_census_equals_batch_datacard_across_restart(spark, tmp_path):
    src = tmp_path / "docs_src"
    src.mkdir()
    census = tmp_path / "census"
    ckpt = tmp_path / "census_ckpt"

    q = _stream(spark, src, census, ckpt)
    try:
        for i in range(2):
            _write_batch(src, i, BATCHES[i])
            time.sleep(0.1)
            q.processAllAvailable()
    finally:
        q.stop()

    # mid-stream read equals the batch datacard of what's arrived so far
    mid = sorted(
        tuple(r) for r in read_census_datacard(spark, str(census)).collect()
    )
    assert mid == _expected_datacard(spark, _rows(BATCHES[:2]))

    # restart from the same checkpoint; batch 2 arrives
    _write_batch(src, 2, BATCHES[2])
    q2 = _stream(spark, src, census, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        tuple(r) for r in read_census_datacard(spark, str(census)).collect()
    )
    assert got == _expected_datacard(spark, _rows(BATCHES))


def test_census_replay_semantics(spark, tmp_path):
    census = tmp_path / "census_replay"
    b0 = spark.createDataFrame(BATCHES[0], SCHEMA)
    apply_census_batch(b0, 0, str(census))
    before = sorted(
        tuple(r) for r in read_census_partials(spark, str(census)).collect()
    )
    # committed replay with different content: no-op
    poison = spark.createDataFrame([(99, "zh", "crawl", 5, "x y z")], SCHEMA)
    apply_census_batch(poison, 0, str(census))
    after = sorted(
        tuple(r) for r in read_census_partials(spark, str(census)).collect()
    )
    assert after == before
    # uncommitted replay (marker removed) overwrites cleanly
    os.remove(os.path.join(str(census), "_commits", "0"))
    apply_census_batch(b0, 0, str(census))
    assert (
        sorted(
            tuple(r)
            for r in read_census_partials(spark, str(census)).collect()
        )
        == before
    )


def test_census_compaction_preserves_and_survives_crashes(spark, tmp_path):
    import shutil

    from big_data_occupancy_detection_spark.streaming.census import (
        compact_census,
    )

    census = tmp_path / "census_compact"
    for i, rows in enumerate(BATCHES):
        apply_census_batch(spark.createDataFrame(rows, SCHEMA), i, str(census))
    before = sorted(
        tuple(r) for r in read_census_datacard(spark, str(census)).collect()
    )

    # a crashed compaction = staging dir without the rename: ignored
    stale = census / "compacted" / ".staging-0-1"
    stale.mkdir(parents=True)
    assert (
        sorted(tuple(r) for r in read_census_datacard(spark, str(census)).collect())
        == before
    )

    # real compaction of the full committed prefix
    assert compact_census(spark, str(census)) == len(BATCHES)
    assert sorted(
        tuple(r) for r in read_census_datacard(spark, str(census)).collect()
    ) == before
    # the per-batch dirs are gone; the compacted range serves alone
    assert not any(
        (census / "deltas" / f"batch-{i}").exists() for i in range(len(BATCHES))
    )

    # a crash AFTER the commit rename but BEFORE cleanup must not
    # double-count: recreate a subsumed per-batch dir and re-read
    apply_census_batch(
        spark.createDataFrame(BATCHES[0], SCHEMA), 99, str(census)
    )  # also prove post-compaction ingest keeps working
    shutil.copytree(
        census / "deltas" / "batch-99", census / "deltas" / "batch-1"
    )
    got = sorted(
        tuple(r) for r in read_census_datacard(spark, str(census)).collect()
    )
    want = _expected_datacard(spark, _rows(BATCHES) + BATCHES[0])
    assert got == want  # batch-1 (subsumed by 0-2) ignored; batch-99 counted

    # nothing new to compact twice in a row is a no-op... but one fresh
    # batch after a prior compaction IS compactable (prefix extension)
    assert compact_census(spark, str(census)) == 1
    assert (
        sorted(tuple(r) for r in read_census_datacard(spark, str(census)).collect())
        == want
    )
    assert compact_census(spark, str(census)) == 0
