"""k-core peeling gates (round 7) — the operator is iterative (rows-only
in the registry), so correctness lives here: a hypothesis property test
against a pure-Python peeling reference, plus the registry query's
structural contract on real testdata."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext.graph import kcore


def _py_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peeling: remove low-degree nodes until fixpoint;
    returns {node: in-core degree}."""
    live = set(edges)
    while True:
        deg: dict[int, int] = {}
        for u, v in live:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            return deg
        live = {(u, v) for u, v in live if u not in low and v not in low}


_edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=0,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_edge_lists, k=st.sampled_from([2, 3]))
def test_kcore_matches_python_peeling(spark, raw, k):
    """For ANY small graph (parallel edges collapsed, either
    orientation) and k ∈ {2,3}, the distributed peel equals the Python
    reference — node set AND in-core degrees."""
    edges = {(min(u, v), max(u, v)) for u, v in raw}
    want = _py_kcore(edges, k)
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "u long, v long")
    got = {r["node"]: r["core_degree"] for r in kcore(df, k=k).collect()}
    assert got == want


def test_kcore_registry_query_contract(spark, sf_dir):
    """copurchase_kcore on real testdata: every emitted degree ≥ K (the
    structural gate must not fire), and the k-core is a SUBGRAPH of the
    support-≥2 co-purchase node set."""
    from big_data_occupancy_detection_spark.plans.warehouse import (
        _KCORE_K,
        copurchase_kcore,
    )

    rows = copurchase_kcore(spark, sf_dir).collect()
    assert all(r["core_degree"] >= _KCORE_K for r in rows)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = {
        r["l_partkey"] for r in li.select("l_partkey").distinct().collect()
    }
    assert {r["part"] for r in rows} <= parts
