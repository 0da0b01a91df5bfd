"""Source rate limiting (maxFilesPerTrigger): a backlog drains in paced
micro-batches rather than one giant batch — the backpressure control
that keeps state/memory bounded when a stream job starts against a deep
backlog (the 100 TB catch-up scenario).
"""

from __future__ import annotations

import json


def test_max_files_per_trigger_paces_backlog(spark, tmp_path):
    src = tmp_path / "backlog"
    src.mkdir()
    for i in range(6):
        (src / f"f{i}.json").write_text(json.dumps({"v": i}))

    stream = (
        spark.readStream.format("json")
        .schema("v long")
        .option("maxFilesPerTrigger", "2")
        .load(str(src))
    )
    batch_sizes = []

    def record(batch_df, batch_id):
        batch_sizes.append(batch_df.count())

    q = stream.writeStream.foreachBatch(record).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 6 files at 2 per trigger -> 3 batches of 2 rows; unpaced would be
    # one batch of 6
    assert sum(batch_sizes) == 6
    assert len(batch_sizes) == 3 and all(b == 2 for b in batch_sizes), batch_sizes
