"""Parity tests for the Arrow-vectorized text folds (ext/text_vec.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext.text_vec import (
    bigram_pairs_jvm,
    hashed_bigram_pairs,
)


def _pair_multiset_stats(big, h1="h1", h2="h2"):
    """Hash-independent invariants of a pair stream: per-doc pair counts
    and the corpus bigram-count HISTOGRAM (how many distinct bigrams
    occur k times) — identical iff the pair structures are identical,
    regardless of which 64-bit token-id function produced them."""
    per_doc = {
        r.doc_id: r.n
        for r in big.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hist = {
        r.cb: r.n
        for r in big.groupBy(h1, h2)
        .agg(F.count(F.lit(1)).alias("cb"))
        .groupBy("cb")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return per_doc, hist


def test_hashed_bigram_pairs_matches_jvm_twin(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox. The quick brown cat!"),
            (2, "the the the"),
            (3, "singleton"),          # 1 token -> no pairs
            (4, ""),                   # empty -> no pairs
            (5, None),                 # null -> no pairs
            (6, "a b a b a"),          # repeated bigrams
        ],
        ["doc_id", "text"],
    ).repartition(3)
    vec = hashed_bigram_pairs(docs)
    jvm = bigram_pairs_jvm(docs)
    assert _pair_multiset_stats(vec) == _pair_multiset_stats(jvm)
    # doc 3/4/5 contribute nothing; doc 1 has 7 pairs; doc 2 has 2
    per_doc, _ = _pair_multiset_stats(vec)
    assert per_doc == {1: 7, 2: 2, 6: 4}


def test_hashed_bigram_pairs_deterministic_across_runs(spark):
    """pandas' fixed-key SipHash must give identical ids on every run
    and partition layout (the property builtin hash() lacks)."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(40)],
        ["doc_id", "text"],
    )
    a = sorted(tuple(r) for r in hashed_bigram_pairs(docs.repartition(2)).collect())
    b = sorted(tuple(r) for r in hashed_bigram_pairs(docs.repartition(13)).collect())
    assert a == b


def test_doc_bigram_logprob_matches_expression_form(spark, sf_dir):
    """End-to-end parity of the registered (vectorized) query against a
    from-scratch pure-Catalyst formulation on real testdata."""
    from big_data_occupancy_detection_spark.plans.analytics import (
        doc_bigram_logprob,
    )
    from big_data_occupancy_detection_spark.sources.readers import table

    got = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in doc_bigram_logprob(spark, sf_dir).collect()
    }

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    big = bigram_pairs_jvm(docs).localCheckpoint(eager=True)
    bstats = big.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("cb"))
    fstats = bstats.groupBy("h1").agg(F.sum("cb").cast("double").alias("cf"))
    v = (
        bstats.select(F.col("h1").alias("t"))
        .union(bstats.select(F.col("h2").alias("t")))
        .agg(F.countDistinct("t").cast("double").alias("v"))
    )
    from big_data_occupancy_detection_spark.functions.rounding import (
        portable_round,
    )

    scored = (
        big.join(bstats, ["h1", "h2"])
        .join(fstats, "h1")
        .crossJoin(F.broadcast(v))
        .withColumn("lp", F.log((F.col("cb") + 1.0) / (F.col("cf") + F.col("v"))))
    )
    want = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            portable_round(F.avg("lp"), 6).alias("avg_logprob"),
        )
        .collect()
    }
    assert got == want
