"""Property-based check: asof_join ≡ naive per-row backward lookup."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_occupancy_detection_spark.operators.temporal import asof_join

BASE = dt.datetime(2024, 1, 1)

keys = st.integers(min_value=0, max_value=3)
ticks = st.integers(min_value=0, max_value=60)

left_rows = st.lists(st.tuples(keys, ticks), min_size=1, max_size=25)
right_rows = st.lists(st.tuples(keys, ticks, st.integers(0, 999)), max_size=25)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_matches_naive(spark, left, right):
    # right side must be unique per (key, ts) — the operator's contract
    right_map = {(k, t): v for k, t, v in right}
    right_list = [(k, t, v) for (k, t), v in right_map.items()]

    ldf = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(minutes=t))
            for i, (k, t) in enumerate(left)
        ],
        "lid LONG, k LONG, lts TIMESTAMP",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=t), float(v)) for k, t, v in right_list],
        "k LONG, rts TIMESTAMP, val DOUBLE",
    ) if right_list else spark.createDataFrame([], "k LONG, rts TIMESTAMP, val DOUBLE")

    got = {
        r.lid: r.val
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }

    for i, (k, t) in enumerate(left):
        candidates = [(rt, v) for (rk, rt), v in right_map.items() if rk == k and rt <= t]
        expect = float(max(candidates)[1]) if candidates else None
        assert got[i] == expect, f"row {i} key={k} t={t}: {got[i]} != {expect}"


band_rows = st.lists(st.tuples(keys, ticks), min_size=1, max_size=20)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=band_rows, band=st.integers(min_value=1, max_value=10))
def test_band_join_matches_naive(spark, rows, band):
    from big_data_occupancy_detection_spark.operators.temporal import (
        band_self_join_pairs,
    )

    df = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(minutes=t))
            for i, (k, t) in enumerate(rows)
        ],
        "id LONG, k LONG, t TIMESTAMP",
    )
    got = {
        (r.a_id, r.b_id)
        for r in band_self_join_pairs(
            df, on=["k"], ts_col="t", id_col="id", band_seconds=band * 60
        ).collect()
    }
    expect = set()
    for i, (ki, ti) in enumerate(rows):
        for j, (kj, tj) in enumerate(rows):
            if ki != kj or i == j:
                continue
            if 0 <= (tj - ti) * 60 <= band * 60 and (ti, i) < (tj, j):
                expect.add((i, j))
    assert got == expect
