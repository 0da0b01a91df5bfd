"""Local replica of the driver's DuckDB-oracle gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet, compare
row count, column names/order-insensitively, and values."""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_occupancy_detection_spark.plans import REGISTRY
from big_data_occupancy_detection_spark.sources.readers import TABLE_NAMES

from conftest import SF_DIR

ORACLE_SPECS = sorted(
    (name, spec) for name, spec in REGISTRY.items() if spec.oracle is not None
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [colnames[i] for i in order], out


def _values_match(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9) or (
            math.isnan(a) and math.isnan(b)
        )
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b


@pytest.mark.parametrize("name,spec", ORACLE_SPECS, ids=[n for n, _ in ORACLE_SPECS])
def test_oracle_parity(spark, name, spec, monkeypatch):
    oracle = spec.oracle
    if callable(oracle):
        # lazy oracle (r10): bake against the SAME sf dir this test runs
        monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
        oracle = oracle()
        if oracle is None:
            pytest.skip("lazy oracle unavailable in this environment")
    sdf = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = _duck(SF_DIR)
    cur = con.execute(oracle)
    dcols = [d[0] for d in cur.description]
    drows = [tuple(r) for r in cur.fetchall()]
    con.close()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duck={len(drows)}"
    )
    _, s_norm = _normalize(srows, scols)
    _, d_norm = _normalize(drows, dcols)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for sv, dv in zip(sr, dr):
            assert _values_match(sv, dv), (
                f"{name}: value mismatch at sorted-row {i}: spark={sr} duck={dr}"
            )


def test_rows_only_queries_run(spark):
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            df = spec.fn(spark, SF_DIR)
            assert df.count() >= 0, name
            assert len(df.schema.fields) > 0, name
