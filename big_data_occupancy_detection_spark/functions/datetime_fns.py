"""Date/time column helpers (all JVM-side Catalyst expressions, no UDFs).

The reference's only custom temporal logic is the Monday=1 day-of-week remap
``((dayofweek+5)%7)+1`` (``eda/eda_analysis.py:104-107``) — Spark's
``dayofweek`` is Sun=1 while the analysis wants ISO Mon=1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dow_monday(ts: Column | str) -> Column:
    """ISO day-of-week: Monday=1 … Sunday=7 (equals SQL ``isodow``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return ((F.dayofweek(c) + F.lit(5)) % F.lit(7)) + F.lit(1)


def epoch_seconds(col: Column | str) -> Column:
    """Timestamp → fractional epoch seconds, tolerant of NTZ columns.

    Parquet timestamps arrive as TIMESTAMP_NTZ or TIMESTAMP_LTZ depending
    on how the writer set ``isAdjustedToUTC``; Spark forbids casting NTZ
    directly to a number, so go through ``timestamp`` first (a no-op for
    LTZ, wall-clock-in-session-TZ for NTZ — with the engine's pinned UTC
    session the two coincide). Fractional seconds survive (``unix_timestamp``
    truncates, which would disagree with exact interval oracles).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def tolerant_timestamp(col: Column | str) -> Column:
    """Malformed-tolerant string→timestamp: NULL on garbage, never throws.

    Spark 4 defaults to ANSI mode, where a plain ``cast`` raises
    CAST_INVALID_INPUT on unparseable input; ``try_to_timestamp`` restores
    the degrade-to-null contract the nullable-by-default pipeline depends
    on. Accepts the formats seen in the wild (plain ``2015-02-04 17:51:00``,
    ISO with offset ``2015-02-02T14:19:00.000+01:00``) via Spark's default
    multi-format parser.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)
