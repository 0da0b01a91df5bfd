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
    InputPartition,
    SimpleDataSourceStreamReader,
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


def register_eventgen(spark) -> None:
    """Idempotent registration of the eventgen format on a session."""
    spark.dataSource.register(EventGenDataSource)
