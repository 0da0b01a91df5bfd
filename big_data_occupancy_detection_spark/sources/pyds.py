"""Custom connector via the Python DataSource API (Spark 4, SPARK-44076).

``EventGenDataSource`` is a deterministic synthetic-event generator: a
partition-parallel batch source whose every value derives from the
portable md5 hash recipe (``functions.text_fns.md5_hash64``), so a
DuckDB oracle can replay the exact rows — a full value-hash correctness
gate for a *source*, not just a query.

This demonstrates the engine's connector surface beyond file formats:
``partitions()`` splits the id range so a 1000-executor cluster
generates in parallel with zero coordination (each partition's rows are
a pure function of (start, end)), the same pattern a real partitioned
JDBC/REST/object-store connector uses.

Register once per session, then read like any format::

    spark.dataSource.register(EventGenDataSource)
    df = (spark.read.format("eventgen")
          .option("rows", 100000).option("parts", 32).load())
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ["view", "click", "purchase", "refund"]


def _h64(s: str) -> int:
    """Portable 60-bit md5 hash — same recipe as text_fns.md5_hash64 and
    the DuckDB expression CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def gen_row(i: int) -> tuple[int, int, str, float]:
    """The single-row recipe, shared by every partition and the oracle."""
    hu = _h64(f"u|{i}")
    ht = _h64(f"t|{i}")
    hv = _h64(f"v|{i}")
    return (
        i,
        hu % 1000,
        EVENT_TYPES[ht % 4],
        round((hv % 1000000) / 10000.0, 4),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.parts = max(int(options.get("parts", 8)), 1)

    def partitions(self):
        per = -(-self.rows // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the generator: each micro-batch emits the next
    ``batch_rows`` ids (bounded by ``max_rows``), offset = last id emitted.

    The rows are a pure function of the offset range, so
    ``readBetweenOffsets`` replays any committed-but-lost batch exactly —
    the determinism that gives a custom Python stream source exactly-once
    semantics across restarts (offsets live in the checkpoint; no state
    in the reader itself).
    """

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 1 << 40))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = min(s + self.batch_rows, self.max_rows)
        return iter([gen_row(i) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_row(i) for i in range(int(start["i"]), int(end["i"]))])


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> EventGenReader:
        return EventGenReader(self.options)

    def simpleStreamReader(self, schema) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlManifestWriter(DataSourceWriter):
    """Batch writer half of the connector surface: executor tasks stage
    one JSONL file each under ``_staging/`` and report a commit message;
    the DRIVER's ``commit`` promotes the staged files and writes a
    ``_MANIFEST.json`` naming exactly the committed files + row counts —
    the two-phase (task-attempt → driver-commit) protocol every
    transactional sink (Hadoop committer, Delta/Iceberg manifest) is
    built on. ``abort`` leaves only ``_staging`` garbage, never a
    half-visible dataset: readers trust the manifest, not the directory
    listing, so failed/speculative task attempts are invisible."""

    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, rows: Iterator) -> _JsonlCommit:
        import json
        import os
        import uuid

        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        fname = os.path.join(self.path, "_staging", f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r.asDict()) + "\n")
                n += 1
        return _JsonlCommit(fname, n)

    def commit(self, messages: list) -> None:
        import json
        import os
        import shutil

        final = []
        for m in messages:
            dst = os.path.join(self.path, os.path.basename(m.path))
            os.rename(m.path, dst)
            final.append({"file": os.path.basename(m.path), "rows": m.rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(sorted(final, key=lambda d: d["file"]), f, indent=1)
        # hygiene AFTER the manifest is durable: drop the staging dir
        # (failed/speculative attempt files would otherwise accumulate
        # forever) and, in overwrite mode, any part file a PREVIOUS
        # commit left behind — readers trust the manifest, but a clean
        # directory keeps listing-based tools honest too
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
        if self.overwrite:
            keep = {d["file"] for d in final}
            for name in os.listdir(self.path):
                if (
                    name.startswith("part-")
                    and name.endswith(".jsonl")
                    and name not in keep
                ):
                    os.remove(os.path.join(self.path, name))

    def abort(self, messages: list) -> None:
        import os
        import shutil

        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging)


class JsonlManifestDataSource(DataSource):
    """``format("jsonl_manifest")`` — write-side custom connector."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def writer(self, schema, overwrite: bool) -> JsonlManifestWriter:
        return JsonlManifestWriter(self.options, overwrite=overwrite)


def register_eventgen(spark) -> None:
    """Idempotent registration of the custom Python connectors."""
    spark.dataSource.register(EventGenDataSource)
    spark.dataSource.register(JsonlManifestDataSource)
