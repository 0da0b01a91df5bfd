"""Array-vector math as Catalyst expressions (no UDFs in the hot path).

Embeddings are ``array<float>`` columns; all math is done in double
precision via ``zip_with`` + ``aggregate`` so it runs inside codegen and
matches a SQL oracle computing the same double-precision sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); NULL-safe denominator (0-norm → NULL, not div-by-zero)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
