"""Round-10 optimization plan gates: operators whose hot paths were
rewritten off SortAggregate must stay HashAggregate (struct/string-
buffered aggregates silently fall back to SortAggregate, which sorts the
whole stream per partition — the r9-measured 291s-vs-174s cost class),
and the centroid argmax must stay map-only (no per-vector fan-out
aggregate at corpus grain)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fuzzy_pairs_dedup_is_hash_aggregable(spark):
    # pair dedup carries the two name strings; they must ride in the
    # GROUPING KEY (pure distinct), not as first() aggregates whose
    # string buffers force SortAggregate over the candidate stream
    from big_data_occupancy_detection_spark.ext.dedup import fuzzy_pairs_edit1

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, "gamma")], ["id", "name"]
    )
    plan = _plan(fuzzy_pairs_edit1(df, "name", "id"))
    assert "SortAggregate" not in plan, (
        "pair dedup fell off HashAggregate — string first() buffers?"
    )


def test_assign_nearest_is_map_only(spark):
    # the argmax must be an in-row fold over the broadcast centroid
    # array: no per-vector crossJoin fan-out, no corpus-grain aggregate,
    # no SortAggregate, no hash exchange of the corpus
    from big_data_occupancy_detection_spark.ext.similarity import (
        _assign_nearest,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        ["vid", "nvec"],
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "__cent"]
    )
    out = _assign_nearest(emb, cent, "vid", "nvec")
    plan = _plan(out)
    assert "SortAggregate" not in plan
    # the only aggregate allowed is the tiny centroid collect_list fold;
    # the corpus side must not be exchanged at all
    corpus_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in corpus_side, (
        "corpus side of the assignment grew a shuffle"
    )
    # winners: max dot, ties to smallest cid — unchanged semantics
    got = {r["vid"]: r["cluster"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_pq_codes_single_projection(spark):
    # all subspace codes must come from ONE map pass: no per-subspace
    # shuffle, no n_sub-way join of corpus-grain code frames
    from big_data_occupancy_detection_spark.ext.similarity import (
        _assign_codes,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 1.0]), (2, [0.0, 1.0, 1.0, 0.0])],
        ["vid", "nvec"],
    )
    c0 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["cid", "__cent"]
    )
    c1 = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])], ["cid", "__cent"]
    )
    out = _assign_codes(emb, [c0, c1], 2, 2)
    plan = _plan(out)
    assert "SortAggregate" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "code table regressed to per-subspace corpus joins"
    )
    rows = {r["vec_id"]: (r["c0"], r["c1"]) for r in out.collect()}
    assert rows == {1: (0, 0), 2: (1, 1)}


def test_argmax_tie_breaks_to_smallest_cid(spark):
    # duplicate centroids: equal dots must elect the SMALLEST cid, the
    # contract the old max_by(cid, struct(dot, -cid)) form guaranteed
    from big_data_occupancy_detection_spark.ext.similarity import (
        _assign_nearest,
    )

    emb = spark.createDataFrame([(7, [1.0, 1.0])], ["vid", "nvec"])
    cent = spark.createDataFrame(
        [(2, [1.0, 1.0]), (0, [1.0, 1.0]), (1, [0.0, 0.0])],
        ["cid", "__cent"],
    )
    got = _assign_nearest(emb, cent, "vid", "nvec").collect()
    assert got[0]["cluster"] == 0
