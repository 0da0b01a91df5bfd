"""Production fast-hash path (SPARK_GRAFT_FAST_HASH=1 → xxhash64).

The dedup operators' correctness contract under ANY hash family:
- candidate verification is exact, so emitted pairs are always a subset of
  the exact-Jaccard ground truth (precision 1.0 by construction);
- banding probability only moves RECALL, which must stay useful.

These tests swap the hash family and assert both properties against the
exact inverted-index ground truth, plus that SimHash stays total.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ext.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from big_data_occupancy_detection_spark.sources.readers import table

from conftest import SF_DIR

THRESHOLD = 0.5


def _pairs(df) -> set[tuple]:
    return {(r["d1"], r["d2"]) for r in df.select("d1", "d2").collect()}


def test_fast_hash_lsh_precision_and_recall(spark, monkeypatch):
    docs = table(spark, SF_DIR, "documents")
    exact = _pairs(ngram_jaccard_pairs(docs, threshold=THRESHOLD))
    assert exact, "corpus should contain near-dup pairs at this threshold"

    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    fast = _pairs(minhash_lsh_pairs(docs, threshold=THRESHOLD))

    # exact verification ⇒ every emitted pair is a true near-dup pair
    assert fast <= exact, f"false positives under fast hash: {fast - exact}"
    # banding with xxhash64 must still find most true pairs
    recall = len(fast) / len(exact)
    assert recall >= 0.5, f"fast-hash LSH recall {recall:.2f} < 0.5"


def test_fast_hash_simhash_total(spark, monkeypatch):
    docs = table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    sh = simhash32(docs)
    assert sh.count() == n_docs
    # signatures are real 32-bit values, not degenerate zeros
    n_nonzero = sh.filter(F.col("simhash") != 0).count()
    assert n_nonzero > n_docs * 0.9


def test_minhash_signature_lockstep_with_oracle(spark):
    """Byte-identical MinHash signatures, Spark vs DuckDB, term by term.

    Locks in the seed-0 fix: hash64(c, 0) must hash '0|'||c exactly like the
    oracle's term 0, not fall through to the unseeded hash (which silently
    diverged band-0 LSH keys before exact verification masked it).
    """
    import duckdb

    from big_data_occupancy_detection_spark.ext import dedup as D
    from big_data_occupancy_detection_spark.plans.textops import (
        _SH_CTE,
        _TOKS_CTE,
        hash64_sql,
    )
    from big_data_occupancy_detection_spark.sources.readers import TABLE_NAMES

    docs = table(spark, SF_DIR, "documents").limit(50)
    spark_sig = {
        r["doc"]: list(r["sig"])
        for r in D.minhash_signatures(docs, num_hashes=D.DEFAULT_NUM_HASHES).collect()
    }

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    sig_terms = ", ".join(
        "list_min(list_transform(shingles, s -> " + hash64_sql(f"'{i}|' || s") + "))"
        for i in range(D.DEFAULT_NUM_HASHES)
    )
    oracle_sig = {
        row[0]: list(row[1])
        for row in con.execute(
            f"WITH {_TOKS_CTE}, {_SH_CTE} "
            f"SELECT doc_id, [{sig_terms}] AS sig FROM sh "
            f"WHERE doc_id IN (SELECT doc_id FROM documents LIMIT 50)"
        ).fetchall()
    }
    # compare on the intersection of ids (limit orders may differ); must be
    # a healthy sample and every shared id byte-identical across engines
    shared = set(spark_sig) & set(oracle_sig)
    assert len(shared) >= 25
    for doc in shared:
        assert spark_sig[doc] == oracle_sig[doc], f"signature diverges for {doc}"


def test_fast_hash_dsir_and_novelty_invariants(spark, monkeypatch):
    """Hash-independent columns survive the fast-hash swap untouched:
    DSIR's n_tok (token counts) and novelty's n_shingles (distinctness
    is taken on the shingle STRINGS before hashing). The hash-dependent
    scores may move; the row sets may not."""
    from big_data_occupancy_detection_spark.ext.curation import dsir_log_weights
    from big_data_occupancy_detection_spark.ext.dedup import shingle_novelty

    docs = table(spark, SF_DIR, "documents")
    pred = F.col("source").isin("src0", "src1", "src2")

    slow_d = {r.doc_id: r.n_tok for r in dsir_log_weights(docs, pred).collect()}
    slow_n = {
        r.doc: r.n_shingles for r in shingle_novelty(docs).collect()
    }

    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    fast_d = {r.doc_id: r.n_tok for r in dsir_log_weights(docs, pred).collect()}
    fast_n = {
        r.doc: r.n_shingles for r in shingle_novelty(docs).collect()
    }

    assert fast_d == slow_d
    assert fast_n == slow_n


def test_fast_hash_negative_samples_valid(spark, monkeypatch):
    """Under the xxhash64 production path the negative draws CHANGE
    (documented — oracle parity is the md5 path's contract) but the
    pipeline invariants must hold: draws stay in the 1..max-part range
    (the signed hash must flow through pmod, never %), no kept negative
    collides with a positive, and counts are consistent. Regression for
    the round-5 lesson: a signed hash fed to % doubles the bucket range."""
    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")

    from pyspark.sql import functions as F

    from big_data_occupancy_detection_spark.plans.mlplans import (
        _NEG_K,
        _implicit_examples,
    )

    sf = "/root/testdata/sf0.001"
    _, pos, kept = _implicit_examples(spark, sf)
    n_parts = (
        spark.read.parquet(f"{sf}/part.parquet").agg(F.max("p_partkey")).first()[0]
    )

    bad_range = kept.filter(
        (F.col("neg") < 1) | (F.col("neg") > n_parts)
    ).count()
    assert bad_range == 0

    leaked = kept.join(
        pos.select("user_id", F.col("item").alias("neg")), ["user_id", "neg"]
    ).count()
    assert leaked == 0

    n_pos, n_kept = pos.count(), kept.count()
    assert 0 < n_kept <= _NEG_K * n_pos
