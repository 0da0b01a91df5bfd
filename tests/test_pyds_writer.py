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
    # staged area holds nothing visible
    assert not os.listdir(os.path.join(out, "_staging"))
    # content round-trips
    rows = []
    for f in sorted(files):
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == n
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in docs.collect()
    }
