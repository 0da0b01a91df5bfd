"""End-to-end curation FRONT: quality → repetition → exact dedup →
bloom delta pre-screen → span removal.

The export tail (tokenize → pack → shard) is pinned in
``test_training_export_e2e.py``; this composes the five upstream
filter/dedup stages a pretraining curator runs BEFORE tokenization and
asserts the chain's cross-stage invariants: row accounting is exact at
every stage (filters only remove, transforms preserve), the bloom
pre-screen agrees with exact membership on the kept corpus (no false
negatives by construction), and the whole chain is deterministic
across a rerun — what makes a 100 TB curation job resumable and
auditable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext import curation as C
from big_data_occupancy_detection_spark.ext import dedup as D
from big_data_occupancy_detection_spark.ext import text as TX
from big_data_occupancy_detection_spark.ext.sketches import (
    bloom_build,
    bloom_contains,
)
from big_data_occupancy_detection_spark.sources.readers import table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def curated(spark):
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    n0 = docs.count()

    # 1. C4 heuristic quality battery
    q = C.c4_quality_flags(docs).withColumnRenamed("doc", "doc_id")
    kept_q = docs.join(
        q.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )

    # 2. Gopher repetition rules (token-level filter + the line/5-gram
    #    census from ext.text — censuses are metrics, not a filter here,
    #    but must emit a row for every surviving doc)
    rep = C.repetition_stats(kept_q).withColumnRenamed("doc", "doc_id")
    kept_r = kept_q.join(
        rep.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    census = TX.repetition_features(kept_r)

    # 3. exact dedup: one representative per distinct content
    groups = D.exact_dedup_groups(kept_r)
    kept_d = kept_r.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )

    # 4. span removal emits training-ready text for every survivor
    clean = D.remove_repeated_spans(kept_d, min_len=30)

    return docs, n0, kept_q, kept_r, census, groups, kept_d, clean


def test_stage_row_accounting_is_exact(curated):
    docs, n0, kept_q, kept_r, census, groups, kept_d, clean = curated
    nq, nr, nd = kept_q.count(), kept_r.count(), kept_d.count()
    assert n0 >= nq >= nr >= nd > 0  # filters only remove
    assert census.count() == nr  # census covers every survivor
    assert groups.count() == nd  # one representative per group
    assert clean.count() == nd  # transform preserves rows
    assert clean.filter(F.col("clean_text").isNull()).count() == 0


def test_bloom_prescreen_agrees_with_exact_membership(spark, curated):
    _, _, _, _, _, _, kept_d, _ = curated
    corpus = kept_d.select(
        F.md5(F.coalesce(TX.norm_text("text"), F.lit(""))).alias("fp")
    ).distinct()
    bloom = bloom_build(corpus, "fp")
    # delta = half the kept corpus (seen) + synthetic unseen docs
    seen = kept_d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.md5(F.coalesce(TX.norm_text("text"), F.lit(""))).alias("fp")
    )
    unseen = spark.range(10).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.md5(F.concat(F.lit("never-seen-"), F.col("id"))).alias("fp"),
    )
    delta = seen.unionByName(unseen)
    flags = bloom_contains(bloom, delta, "fp")
    # no false negative: every seen doc is a candidate
    n_seen = seen.count()
    assert (
        flags.filter((F.col("doc_id") < 1_000_000) & F.col("might_contain"))
        .count()
        == n_seen
    )
    # the pre-screen discards most unseen rows without any corpus join
    assert (
        flags.filter(
            (F.col("doc_id") >= 1_000_000) & ~F.col("might_contain")
        ).count()
        >= 8
    )


def test_chain_is_deterministic_across_rerun(spark, curated):
    docs, _, _, _, _, _, kept_d, clean = curated
    q2 = C.c4_quality_flags(docs).withColumnRenamed("doc", "doc_id")
    kq2 = docs.join(q2.filter("keep").select("doc_id"), "doc_id", "left_semi")
    r2 = C.repetition_stats(kq2).withColumnRenamed("doc", "doc_id")
    kr2 = kq2.join(r2.filter("keep").select("doc_id"), "doc_id", "left_semi")
    g2 = D.exact_dedup_groups(kr2)
    kd2 = kr2.join(
        g2.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    assert sorted(r.doc_id for r in kd2.select("doc_id").collect()) == sorted(
        r.doc_id for r in kept_d.select("doc_id").collect()
    )
    clean2 = D.remove_repeated_spans(kd2, min_len=30)
    got = sorted(tuple(r) for r in clean2.collect())
    want = sorted(tuple(r) for r in clean.collect())
    assert got == want
