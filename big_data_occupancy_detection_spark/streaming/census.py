"""Streaming incremental corpus census: a foreachBatch pipeline that
maintains the ``corpus_datacard`` aggregates as documents arrive, so the
"what are we training on" datasheet is always current without ever
re-scanning the corpus.

Census layout under ``census_dir`` (delta-log style, the same
append-plus-commit-marker discipline as ``streaming.dedup_ingest``):

- ``deltas/batch-<id>/``  parquet (lang, source, n_docs, n_tok,
  n_chars) — the micro-batch pre-aggregated to stratum grain (a
  micro-batch contributes at most |langs|·|sources| rows regardless of
  its size, so the persisted log grows with BATCH COUNT, not corpus
  size). Written mode=overwrite so replaying an uncommitted batch is
  idempotent.
- ``_commits/<id>``       empty marker created LAST — the commit point.
  A crash between the delta write and the marker leaves an ignorable
  orphan the replay overwrites; a replay of a committed id is a no-op.

Reads are merge-on-read: union the committed delta dirs (tiny), re-sum
to stratum grain, and hand the partials to the SAME
``ext.curation.datacard_from_docs`` tail the batch ``corpus_datacard``
plan uses — sums of sums equal sums, so the streamed census equals the
batch datacard on the same documents by construction (asserted across a
restart in tests/test_streaming_census.py).

Scale shape: per batch, one map-side-combined aggregation over the
micro-batch only; the read path touches O(committed batches × strata)
rows. When batch count grows unwieldy, :func:`compact_census` replaces
the committed prefix with its sum (the census is associative) behind a
SINGLE atomic rename:

- the summed partials are written to a dot-prefixed staging dir
  (invisible to every reader), then renamed to
  ``compacted/<lo>-<hi>`` — the commit point;
- readers take the compacted range with the largest ``hi``, then
  per-batch dirs only for ids > hi, so per-batch dirs covered by a
  committed compaction are IGNORED, not trusted to be deleted —
  a crash before the rename leaves only ignorable staging, a crash
  after it leaves subsumed per-batch dirs that never double-count;
- cleanup of subsumed dirs is lazy and optional (idempotent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_fns import tokens
from .dedup_ingest import _committed_ids  # same _commits marker layout


def apply_census_batch(
    batch_df: DataFrame,
    batch_id: int,
    census_dir: str,
    text_col: str = "text",
    chars_col: str = "n_chars",
) -> None:
    """Fold one micro-batch into the census: pre-aggregate to stratum
    grain, append the delta, commit. Idempotent on replay of an
    uncommitted batch; a no-op for a committed one."""
    if batch_df.isEmpty():
        return
    if batch_id in set(_committed_ids(census_dir)):
        return  # replay after a post-commit crash: already applied
    chars = (
        F.col(chars_col)
        if chars_col in batch_df.columns
        else F.length(text_col)
    )
    delta = (
        batch_df.select(
            "lang",
            "source",
            F.size(tokens(text_col)).alias("n_tok"),
            chars.cast("long").alias("n_chars"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(census_dir, "deltas", f"batch-{batch_id}")
    )
    cdir = os.path.join(census_dir, "_commits")
    os.makedirs(cdir, exist_ok=True)
    with open(os.path.join(cdir, str(batch_id)), "w"):
        pass


def _best_compaction(census_dir: str) -> tuple[int, int, str] | None:
    """(lo, hi, path) of the committed compaction covering the most
    batches (largest hi, then largest lo), or None."""
    cdir = os.path.join(census_dir, "compacted")
    if not os.path.isdir(cdir):
        return None
    best = None
    for name in os.listdir(cdir):
        if name.startswith("."):
            continue  # staging of an in-flight (crashed) compaction
        try:
            lo, hi = (int(x) for x in name.split("-"))
        except ValueError:
            continue
        if best is None or (hi, lo) > (best[0][1], best[0][0]):
            best = ((lo, hi), os.path.join(cdir, name))
    return (best[0][0], best[0][1], best[1]) if best else None


def read_census_partials(
    spark: SparkSession, census_dir: str
) -> DataFrame | None:
    """(lang, source, n_docs, n_tok, n_chars) summed across every
    committed batch, or None if the census is empty. Per-batch dirs
    covered by a committed compaction are ignored (they may or may not
    still exist — cleanup is lazy)."""
    comp = _best_compaction(census_dir)
    hi = comp[1] if comp else -1
    paths = [
        os.path.join(census_dir, "deltas", f"batch-{i}")
        for i in _committed_ids(census_dir)
        if i > hi
    ]
    paths = [p for p in paths if os.path.isdir(p)]
    if comp:
        paths.append(comp[2])
    if not paths:
        return None
    return (
        spark.read.parquet(*paths)
        .groupBy("lang", "source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def compact_census(spark: SparkSession, census_dir: str) -> int:
    """Replace the committed prefix of per-batch deltas with its sum.

    Returns the number of delta dirs the new compaction subsumes (0 if
    there is nothing to compact). Crash-safe with one atomic rename:
    the summed partials are staged dot-prefixed, renamed into
    ``compacted/<lo>-<hi>`` (the commit point), and only then are the
    now-subsumed per-batch dirs (and any older, narrower compaction)
    removed — readers ignore subsumed dirs by range, so a crash at any
    step leaves a correct census. Run from ONE maintenance process at a
    time (same contract as ``sources.sinks.compact_parquet``); a racing
    duplicate of the SAME range is detected at the commit rename and
    skipped, but concurrent compactions of different ranges are not
    supported.

    The frame that is summed is built from the EXPLICIT list of dirs
    being subsumed (``fresh`` + the prior compaction) — never from a
    re-listing of the commit log — so a batch the live ``census_sink``
    commits mid-compaction stays outside the compacted range and is
    counted exactly once by readers.
    """
    import shutil

    ids = _committed_ids(census_dir)
    prior = _best_compaction(census_dir)
    prior_hi = prior[1] if prior else -1
    fresh = [
        i
        for i in ids
        if i > prior_hi
        and os.path.isdir(os.path.join(census_dir, "deltas", f"batch-{i}"))
    ]
    if not fresh or (prior is None and len(fresh) < 2):
        return 0
    lo = prior[0] if prior else min(fresh)
    hi = max(fresh)
    paths = [
        os.path.join(census_dir, "deltas", f"batch-{i}") for i in fresh
    ]
    if prior:
        paths.append(prior[2])
    summed = (
        spark.read.parquet(*paths)
        .groupBy("lang", "source")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    cdir = os.path.join(census_dir, "compacted")
    os.makedirs(cdir, exist_ok=True)
    staging = os.path.join(cdir, f".staging-{lo}-{hi}")
    summed.write.mode("overwrite").parquet(staging)
    final = os.path.join(cdir, f"{lo}-{hi}")
    try:
        os.rename(staging, final)  # commit
    except OSError:
        if not os.path.isdir(final):
            raise
        # a racing duplicate of the same range already committed an
        # identical sum; drop our staging and fall through to cleanup
        shutil.rmtree(staging, ignore_errors=True)
    # cleanup: EVERY per-batch dir the committed range now covers (not
    # just this invocation's fresh list — a crash here on a previous
    # run may have left older subsumed dirs), any narrower compaction,
    # and any stale staging from crashed runs
    for name in os.listdir(os.path.join(census_dir, "deltas")):
        if name.startswith("batch-"):
            try:
                bid = int(name.removeprefix("batch-"))
            except ValueError:
                continue
            if bid <= hi:
                shutil.rmtree(
                    os.path.join(census_dir, "deltas", name),
                    ignore_errors=True,
                )
    for name in os.listdir(cdir):
        path = os.path.join(cdir, name)
        if name.startswith("."):
            shutil.rmtree(path, ignore_errors=True)
            continue
        if path == final:
            continue
        # delete only compactions STRICTLY SUBSUMED by the committed
        # range (r5 advice): "everything that is not final" would also
        # delete a WIDER committed compaction (debris of a violated
        # single-maintainer contract) whose extra batches step 1 of
        # cleanup already removed from deltas/ — readers would silently
        # lose those counts. A wider/overlapping range is left for the
        # best-compaction reader to prefer and a later run to subsume.
        try:
            lo_other, hi_other = (int(x) for x in name.split("-", 1))
        except ValueError:
            continue
        if lo <= lo_other and hi_other <= hi:
            shutil.rmtree(path, ignore_errors=True)
    return len(fresh)


def read_census_datacard(
    spark: SparkSession, census_dir: str
) -> DataFrame | None:
    """The full ``corpus_datacard`` shape (ROLLUP grains, gid, shares)
    over everything ingested so far — equal by construction to the batch
    plan on the same documents."""
    from ..ext.curation import datacard_from_docs

    partials = read_census_partials(spark, census_dir)
    if partials is None:
        return None
    return datacard_from_docs(partials)


def census_sink(
    docs_stream: DataFrame,
    census_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    chars_col: str = "n_chars",
):
    """Start the checkpointed foreachBatch census query. Exactly-once:
    Spark's checkpoint replays an in-flight batch with the same batch_id
    after a crash/restart, and the commit markers make the replay
    idempotent."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_census_batch(
            batch_df, batch_id, census_dir,
            text_col=text_col, chars_col=chars_col,
        )

    return (
        docs_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
