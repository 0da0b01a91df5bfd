"""Cross-engine determinism of functions.rounding.portable_round.

The trap this guards: native round() on a double whose exact decimal
value is a half-ulp boundary (x.xxxx5…) diverges between Spark (rounds
the shortest decimal rendering, HALF_UP) and DuckDB (rounds the binary
value). Every boundary value below is an exact rational of the kind the
registry's oracles round (integer ratios, averages of 2-decimal money),
so this is precisely the class that flipped `event_key_skew_profile` in
round 2 on driver-regenerated data.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.functions.rounding import (
    portable_round,
    portable_round_sql,
)


def _boundary_doubles(digits: int, n: int = 400) -> list[float]:
    """Doubles whose exact decimal terminates one digit past `digits`,
    ending in 5 — the half-ulp boundary for `digits`-rounding. Denominator
    10^(digits+1) carries a factor 5, so the double is binary-inexact and
    the two engines' native round() can disagree on it."""
    scale = 10 ** (digits + 1)
    out = []
    for k in range(n):
        # spread across magnitudes and include negatives
        mant = 10 * (7 * k + 1) + 5  # …5 final digit
        out.append(mant / scale)
        out.append(-mant / scale)
        out.append((mant + 10 * scale) / scale)  # shift past 10.0
    return out


def _ratio_doubles(n: int = 500) -> list[float]:
    """Integer ratios p/q like avg(cnt) / count ratios produce."""
    vals = []
    for q in range(1, 40):
        for p in range(1, 1 + n // 40):
            vals.append(p / q)
    return vals


@pytest.mark.parametrize("digits", [4, 6])
def test_portable_round_matches_duckdb_on_boundaries(spark, digits):
    xs = _boundary_doubles(digits) + _ratio_doubles()
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {
        r["i"]: r["y"]
        for r in df.select("i", portable_round("x", digits).alias("y")).collect()
    }
    con = duckdb.connect()
    sql = portable_round_sql("x", digits)
    for i, x in enumerate(xs):
        (want,) = con.execute(f"SELECT {sql} FROM (SELECT CAST(? AS DOUBLE) AS x)", [x]).fetchone()
        assert got[i] == want, f"portable_round({x!r}, {digits}): spark={got[i]!r} duckdb={want!r}"


def test_native_round_actually_diverges_on_boundary_class(spark):
    """Documents WHY portable_round exists: across the boundary set the
    engines' native round() disagree somewhere. If this ever stops
    failing-to-agree, native round became portable and the helper could
    be retired."""
    xs = _boundary_doubles(4, n=300)
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {r["i"]: r["y"] for r in df.select("i", F.round("x", 4).alias("y")).collect()}
    con = duckdb.connect()
    diverged = 0
    for i, x in enumerate(xs):
        (want,) = con.execute(
            "SELECT round(CAST(? AS DOUBLE), 4)", [x]
        ).fetchone()
        if got[i] != want:
            diverged += 1
    assert diverged > 0


def test_portable_round_null_and_sign(spark):
    df = spark.createDataFrame([(None,), (0.0,), (-0.00005,)], "x double")
    rows = df.select(portable_round("x", 4).alias("y")).collect()
    assert rows[0]["y"] is None
    assert rows[1]["y"] == 0.0
    # half-up-toward-+inf on negatives: floor(-0.5 + 0.5) = 0 — documented
    assert rows[2]["y"] == 0.0
