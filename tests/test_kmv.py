"""KMV (bottom-k / theta) sketch: prune exactness, estimator envelope,
set-algebra composition. The registry query `kmv_day_retention` carries
the oracle-parity gate; these pin the operator-level contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext.sketches import (
    KMV_SPACE,
    kmv_distinct_estimate,
    kmv_sketch,
)


def _frame(spark):
    # group A: 40 keys (< k: sketch exhaustive), group B: 5000, group C:
    # 3000 overlapping B by 1000 — enough mass to exercise the estimator
    rows = (
        [("A", f"a{i}") for i in range(40)]
        + [("B", f"b{i}") for i in range(5000)]
        + [("C", f"b{i}") for i in range(4000, 7000)]
    )
    # duplicates must not matter (sketch is over distincts)
    rows += rows[:500]
    return spark.createDataFrame(rows, "g string, k string")


def test_kmv_prune_is_exact_k_smallest(spark):
    """The bucket prune must be invisible: sketch == the k smallest
    distinct hashes per group computed naively (and exhaustive when the
    group has fewer than k distincts)."""
    from big_data_occupancy_detection_spark.functions.text_fns import (
        md5_hash64,
    )

    df = _frame(spark)
    k = 64
    sk, counts = kmv_sketch(df, "k", "g", k=k)
    got = {
        g: [r["h"] for r in rows]
        for g, rows in _by_group(sk.orderBy("g", "r").collect()).items()
    }
    naive = (
        df.select("g", md5_hash64(F.col("k")).alias("h"))
        .distinct()
        .collect()
    )
    want: dict[str, list[int]] = {}
    for r in naive:
        want.setdefault(r["g"], []).append(r["h"])
    for g in want:
        want[g] = sorted(want[g])[:k]
    assert got == want
    cnt = {r["g"]: r["n_distinct"] for r in counts.collect()}
    assert cnt == {"A": 40, "B": 5000, "C": 3000}
    assert len(got["A"]) == 40  # exhaustive below k


def _by_group(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["g"], []).append(r)
    return out


def test_kmv_estimator_envelope_and_union(spark):
    """Distinct estimates within the k=256 relative-error envelope
    (~1/sqrt(k-2) ≈ 6.3%; assert 4σ = 25%), exact below k, and the union
    sketch of two groups estimates |B ∪ C| from the two k-row sketches
    alone."""
    df = _frame(spark)
    k = 256
    sk, counts = kmv_sketch(df, "k", "g", k=k)
    est = {
        r["g"]: (r["n_distinct"], r["est"])
        for r in kmv_distinct_estimate(sk, counts, k=k).collect()
    }
    assert est["A"] == (40, 40.0)  # exhaustive → exact
    for g, exact in (("B", 5000), ("C", 3000)):
        n, e = est[g]
        assert n == exact
        assert abs(e - exact) / exact < 0.25, (g, e)

    # union composition: k smallest of the two sketches' hash union
    hb = sorted(r["h"] for r in sk.filter("g = 'B'").collect())
    hc = sorted(r["h"] for r in sk.filter("g = 'C'").collect())
    u = sorted(set(hb) | set(hc))[:k]
    union_est = (k - 1) * KMV_SPACE / u[-1]
    assert abs(union_est - 7000) / 7000 < 0.25
    # intersection via Jaccard on the union sketch
    rho = sum(1 for h in u if h in set(hb) and h in set(hc))
    inter_est = rho / k * union_est
    assert abs(inter_est - 1000) / 1000 < 0.5  # intersection noisier


def test_kmv_accumulator_equals_batch_sketch(spark):
    """Streaming twin: per-batch KMV sketches merged by bottom-k union
    must equal the one-shot sketch over the union of all batches — the
    mergeability contract that makes KMV the streaming distinct counter."""
    from big_data_occupancy_detection_spark.ext.sketches import (
        KmvAccumulator,
        kmv_sketch,
    )

    batches = [
        [("A", f"a{i}") for i in range(400)],
        [("A", f"a{i}") for i in range(200, 700)] + [("B", f"b{i}") for i in range(50)],
        [("B", f"b{i}") for i in range(30, 90)] + [("A", f"x{i}") for i in range(100)],
    ]
    k = 64
    acc = KmvAccumulator(k=k)
    for rows in batches:
        acc.merge_batch(spark.createDataFrame(rows, "g string, k string"), "k", "g")

    union = spark.createDataFrame(
        [r for rows in batches for r in rows], "g string, k string"
    )
    want_sk, _ = kmv_sketch(union, "k", "g", k=k)
    want = {(r["g"], r["h"], r["r"]) for r in want_sk.collect()}
    got = {(r["g"], r["h"], r["r"]) for r in acc.as_dataframe(spark).collect()}
    assert got == want

    # estimates: A has 800 distinct (> k, estimator), B has 90 (> k at 64)
    assert abs(acc.estimate("A") - 800) / 800 < 0.35
    assert acc.estimate("missing") == 0.0


def test_kmv_accumulator_exact_at_k_boundary(spark):
    """r6 advice: a group with EXACTLY k true distincts never truncated,
    so its estimate must be the exact count (len(hs)==k), matching
    kmv_distinct_estimate's n_distinct<=k branch — not the biased
    (k-1)·M/h_k estimator the old len(hs)<k check fell through to.
    One distinct past k flips the group to the estimator."""
    from big_data_occupancy_detection_spark.ext.sketches import KmvAccumulator

    k = 16
    acc = KmvAccumulator(k=k)
    # batch 1: group E gets exactly k distincts (split over 2 batches to
    # prove the flag survives merges that stay exhaustive)
    acc.merge_batch(
        spark.createDataFrame(
            [("E", f"e{i}") for i in range(10)], "g string, k string"
        ),
        "k",
        "g",
    )
    acc.merge_batch(
        spark.createDataFrame(
            # overlap e5..e9 + new e10..e15 → union is exactly k=16
            [("E", f"e{i}") for i in range(5, 16)],
            "g string, k string",
        ),
        "k",
        "g",
    )
    assert len(acc.state["E"]) == k
    assert "E" not in acc.truncated
    assert acc.estimate("E") == float(k)  # exact, even at len==k

    # one more distinct → truncation → estimator takes over
    acc.merge_batch(
        spark.createDataFrame([("E", "e16")], "g string, k string"), "k", "g"
    )
    assert "E" in acc.truncated
    est = acc.estimate("E")
    assert est != float(k) and est > 0.0


def test_kmv_accumulator_merge_touches_only_batch_groups(spark):
    """r6 advice: merge_batch must not re-sort the whole state — a batch
    touching only group B leaves group A's list object identical."""
    from big_data_occupancy_detection_spark.ext.sketches import KmvAccumulator

    acc = KmvAccumulator(k=8)
    acc.merge_batch(
        spark.createDataFrame(
            [("A", f"a{i}") for i in range(20)], "g string, k string"
        ),
        "k",
        "g",
    )
    a_before = list(acc.state["A"])
    a_id = id(acc.state["A"])
    acc.merge_batch(
        spark.createDataFrame(
            [("B", f"b{i}") for i in range(3)], "g string, k string"
        ),
        "k",
        "g",
    )
    assert acc.state["A"] == a_before
    assert id(acc.state["A"]) == a_id  # untouched, not rebuilt
    assert acc.estimate("B") == 3.0
    # A had 20 distincts in ONE batch at k=8: kmv_sketch trims it to k
    # rows BEFORE merge_batch sees it, so truncation must come from the
    # counts frame (round-7 review) — estimate uses the estimator, never
    # a claimed-exact 8.0
    assert "A" in acc.truncated
    est = acc.estimate("A")
    assert est != 8.0 and abs(est - 20) / 20 < 0.8


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_kmv_frames = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),
        st.text(alphabet="abcdef0123456789", min_size=0, max_size=8),
    ),
    min_size=1,
    max_size=300,
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_kmv_frames, k=st.sampled_from([1, 3, 16]))
def test_kmv_prune_property(spark, rows, k):
    """For ANY key multiset (duplicates, empty strings, tiny groups) and
    any k, the bucket-pruned sketch equals the naive per-group k smallest
    distinct hashes, and n_distinct is exact."""
    import hashlib

    df = spark.createDataFrame(rows, "g string, k string")
    sk, counts = kmv_sketch(df, "k", "g", k=k)
    got: dict[str, list[int]] = {}
    for r in sk.collect():
        got.setdefault(r["g"], []).append((r["r"], r["h"]))
    want: dict[str, list[int]] = {}
    exact: dict[str, int] = {}
    for g in {g for g, _ in rows}:
        hs = sorted(
            {
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                for gg, s in rows
                if gg == g
            }
        )
        exact[g] = len(hs)
        want[g] = [(i + 1, h) for i, h in enumerate(hs[:k])]
    assert {g: sorted(v) for g, v in got.items()} == want
    assert {r["g"]: r["n_distinct"] for r in counts.collect()} == exact
