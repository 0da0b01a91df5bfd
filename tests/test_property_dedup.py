"""Property-based checks for the dedup family: star-contraction CC must
equal propagation CC on arbitrary graphs, and prefix-filtered Jaccard must
equal the exhaustive inverted-index join on arbitrary corpora."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_occupancy_detection_spark.ext.dedup import (
    connected_components,
    connected_components_star,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
)

nodes = st.integers(min_value=0, max_value=30)
edges = st.lists(
    st.tuples(nodes, nodes).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _naive_components(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x] - seen:
                seen.add(y)
                stack.append(y)
        lbl = min(comp)
        for x in comp:
            label[x] = lbl
    return label


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=edges)
def test_cc_star_and_propagation_match_naive(spark, pairs):
    expect = _naive_components(pairs)
    df = spark.createDataFrame(pairs, ["d1", "d2"])
    prop = {r.doc: r.cluster for r in connected_components(df, max_iter=40).collect()}
    star = {
        r.doc: r.cluster
        for r in connected_components_star(df, max_rounds=15).collect()
    }
    assert prop == expect
    assert star == expect


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=12).map(lambda ws: " ".join(ws)),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_prefix_jaccard_equals_exhaustive(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    for threshold in (0.3, 0.5, 0.8):
        base = {
            (r.d1, r.d2, r.jaccard)
            for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
        }
        pref = {
            (r.d1, r.d2, r.jaccard)
            for r in ngram_jaccard_pairs_prefix(df, threshold=threshold).collect()
        }
        assert pref == base


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy, dup_factor=st.integers(min_value=1, max_value=3))
def test_staged_clusters_equal_direct(spark, texts, dup_factor):
    """Exact-dedup-first staging must return the same (doc, cluster) set as
    running CC over the full-corpus pair graph — including duplicate-heavy
    corpora (every doc replicated dup_factor times)."""
    from big_data_occupancy_detection_spark.ext.dedup import (
        near_dup_clusters_staged,
        ngram_jaccard_pairs,
    )

    rows = [
        (i + 1000 * rep, t)
        for i, t in enumerate(texts)
        for rep in range(dup_factor)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    direct_pairs = ngram_jaccard_pairs(df, threshold=0.5)
    direct = {
        (r.doc, r.cluster)
        for r in connected_components(direct_pairs, max_iter=40).collect()
    }
    staged = {
        (r.doc, r.cluster)
        for r in near_dup_clusters_staged(df, threshold=0.5).collect()
    }
    assert staged == direct


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy, dup_factor=st.integers(min_value=1, max_value=3))
def test_staged_minhash_pairs_equal_direct(spark, texts, dup_factor):
    """Rep-level banding + output-linear group expansion must emit exactly
    the direct MinHash-LSH pair set, scores included."""
    from big_data_occupancy_detection_spark.ext.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_staged,
    )

    rows = [
        (i + 1000 * rep, t)
        for i, t in enumerate(texts)
        for rep in range(dup_factor)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    direct = {
        (r.d1, r.d2, r.jaccard)
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    staged = {
        (r.d1, r.d2, r.jaccard)
        for r in minhash_lsh_pairs_staged(df, threshold=0.5).collect()
    }
    assert staged == direct
