"""Custom Python DataSource batch WRITER: two-phase commit + manifest."""

from __future__ import annotations

import json
import os


def test_jsonl_manifest_writer_commits_with_manifest(spark, sf_dir, tmp_path):
    from big_data_occupancy_detection_spark.sources.pyds import register_eventgen

    register_eventgen(spark)
    out = str(tmp_path / "jmout")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    n = docs.count()
    docs.repartition(4).write.format("jsonl_manifest").option("path", out).mode(
        "append"
    ).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(m["rows"] for m in manifest) == n
    assert len(manifest) == 4  # one staged file per task
    # the manifest names exactly the promoted files
    files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert files == {m["file"] for m in manifest}
    # staged area is swept entirely after the manifest is durable
    assert not os.path.isdir(os.path.join(out, "_staging"))
    # content round-trips
    rows = []
    for f in sorted(files):
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == n
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in docs.collect()
    }


def test_jsonl_manifest_overwrite_removes_stale_parts(spark, tmp_path):
    """Overwrite mode must not leave a previous commit's part files
    beside the new manifest (round-3 behavior): listing-based readers
    would double-count. Stray attempt files in _staging are swept too."""
    from big_data_occupancy_detection_spark.sources.pyds import register_eventgen

    register_eventgen(spark)
    out = str(tmp_path / "jmow")
    df1 = spark.range(10).selectExpr("id AS doc_id", "'a' AS lang")
    df1.repartition(3).write.format("jsonl_manifest").option("path", out).mode(
        "append"
    ).save()
    first_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert len(first_files) == 3
    # plant a stray staged file from a "failed attempt"
    os.makedirs(os.path.join(out, "_staging"), exist_ok=True)
    open(os.path.join(out, "_staging", "part-dead.jsonl"), "w").close()

    df2 = spark.range(5).selectExpr("id + 100 AS doc_id", "'b' AS lang")
    df2.repartition(2).write.format("jsonl_manifest").option("path", out).mode(
        "overwrite"
    ).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert files == {m["file"] for m in manifest} and len(files) == 2
    assert not (files & first_files)          # stale parts gone
    assert not os.path.isdir(os.path.join(out, "_staging"))
    rows = []
    for f in files:
        rows += [json.loads(l) for l in open(os.path.join(out, f))]
    assert {r["doc_id"] for r in rows} == set(range(100, 105))
