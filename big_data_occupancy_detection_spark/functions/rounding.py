"""Engine-portable decimal rounding.

Why this exists: ``F.round`` (Spark) and ``round`` (DuckDB) disagree on
doubles whose exact decimal value sits on a half-ulp boundary. Spark
rounds the *shortest decimal rendering* of the double (Java
``BigDecimal.valueOf`` → HALF_UP), DuckDB rounds the *binary* value
(``std::round(x * 10^d)``). For a double like ``2.41565`` whose binary
form is ``2.4156499999999998…``, Spark says ``2.4157`` and DuckDB says
``2.4156``. Any rounding of an exact rational — an average of integer
counts, a count ratio, an interpolation of fixed-decimal prices — can
land on such a boundary, and whether it does depends on the *data*, so
a query that hash-matches at one seed flips at another (seen in round 2:
``event_key_skew_profile`` on driver-regenerated events).

The fix is to spell the rounding as arithmetic both engines evaluate
bit-identically on the same double: ``floor(x * 10^d + 0.5) / 10^d``.
``floor`` of a double is exact in IEEE-754 on both engines, the scale
multiply and the final divide are single correctly-rounded operations,
so the two engines cannot disagree. (For negative inputs this is
half-up-toward-+inf rather than half-away-from-zero — a deliberate,
documented difference from ``round``; determinism across engines is the
contract here, not decimal-round semantics.)

Use :func:`portable_round` in the Spark plan and
:func:`portable_round_sql` in the DuckDB oracle, with the same digits.
Keep native ``round`` only where the argument is generically irrational
(sqrt-based stats) or already exact at the target scale (sums of
fixed-decimal values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column | str, digits: int) -> Column:
    """``floor(x * 10^digits + 0.5) / 10^digits`` as a Spark Column.

    Bit-identical to :func:`portable_round_sql` with the same ``digits``
    when evaluated on the same double. NULL-safe (floor propagates null).
    Note Spark's ``floor`` yields LONG, so ``|x| * 10^digits`` must fit in
    int64 — true for every ratio/average this repo rounds.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**digits)
    return F.floor(c.cast("double") * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def portable_round_sql(expr: str, digits: int) -> str:
    """The identical rounding as portable ANSI SQL (DuckDB-runnable)."""
    scale = 10**digits
    return f"(floor(CAST(({expr}) AS DOUBLE) * {scale}.0 + 0.5) / {scale}.0)"
