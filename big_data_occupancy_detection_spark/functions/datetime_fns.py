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
