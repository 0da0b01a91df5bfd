"""Explode without the duplicated-generator-filter trap.

``F.explode(expensive_array_expr)`` triggers Catalyst's
``InferFiltersFromGenerate`` rule, which inserts ``size(e) > 0 AND
isnotnull(e)`` *below* the Generate — duplicating the entire array
expression. Filter pushdown then carries that copy through any
round-robin exchange down to the file scan, where it runs on the
PRE-repartition partitioning: for a single parquet file that means the
whole tokenize/shingle/hash pipeline executes twice, once of those
serially on one core. Measured at sf0.1 documents: explode of a shingle
array 3.6 s vs 0.98 s with the rewrite below — same 260 388 output rows
(the repo's arrays are never empty, so the inferred filter never drops a
row; it is pure duplicated work).

``explode_fused`` uses ``explode_outer`` — which the rule deliberately
skips — and drops the (non-existent for non-empty arrays) null rows
AFTER the Generate, where the filter touches only the cheap output
column. Rows whose array IS empty/null behave exactly like ``explode``:
they disappear.

At 100 TB this matters twice over: the duplicated expression is the
corpus-dominating compute (tokenization), and the pushed copy defeats
``repartition_for_compute``'s parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_fused(
    df: DataFrame,
    arr: Column | str,
    out: str | tuple[str, str],
    keep: list[str] | None = None,
) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(out))`` minus the duplicated
    inferred filter. ``out`` is one alias for array explode, a
    ``(key, value)`` tuple for map explode. ``keep=None`` keeps every
    existing column (the ``withColumn``-style shape).

    CAVEAT: a NULL *element* inside an array is indistinguishable from the
    empty-array marker row and gets dropped, where plain ``explode`` keeps
    it — use only on arrays whose elements are non-null (every shingle /
    hash / token / band array in this repo)."""
    col = F.col(arr) if isinstance(arr, str) else arr
    aliases = [out] if isinstance(out, str) else list(out)
    exploded = F.explode_outer(col).alias(*aliases)
    base = [F.col(c) for c in keep] if keep is not None else [F.col(c) for c in df.columns]
    res = df.select(*base, exploded)
    guard = F.col(aliases[0]).isNotNull()
    if len(aliases) > 1:
        guard = guard | F.col(aliases[1]).isNotNull()
    return res.filter(guard)
