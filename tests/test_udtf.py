"""Python UDTF surface: SQL lateral table function with Arrow transfer."""

from __future__ import annotations


def test_split_sentences_lateral(spark, sf_dir):
    from big_data_occupancy_detection_spark.functions.udtf_fns import register_udtfs

    register_udtfs(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "__udtf_docs"
    )
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.idx, s.n_words
        FROM __udtf_docs d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id = (SELECT min(doc_id) FROM __udtf_docs)
        ORDER BY s.idx
        """
    ).collect()
    assert rows, "expected at least one sentence"
    assert [r["idx"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["sentence"].strip() == r["sentence"] and r["sentence"]
        assert r["n_words"] == len(r["sentence"].split())


def test_split_sentences_handles_null_and_empty(spark):
    from big_data_occupancy_detection_spark.functions.udtf_fns import register_udtfs

    register_udtfs(spark)
    spark.sql(
        "SELECT * FROM VALUES (1, 'One. Two!  '), (2, NULL), (3, '...') t(id, txt)"
    ).createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        """
        SELECT t.id, s.sentence, s.idx
        FROM __udtf_edge t, LATERAL split_sentences(t.txt) s
        ORDER BY t.id, s.idx
        """
    ).collect()
    assert [(r["id"], r["sentence"], r["idx"]) for r in rows] == [
        (1, "One", 0),
        (1, "Two", 1),
    ]
