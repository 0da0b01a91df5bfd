"""Surgical small-file compaction: adjacent bin-packing + marker commit.

Contract under test: only runs of adjacent small files are merged, every
adequately-sized file keeps its exact bytes, rows survive exactly, a
rerun is a no-op, and the commit-marker protocol recovers from a crash
at any point (roll forward when the merged file landed, roll back when
it didn't).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.sources.readers import table
from big_data_occupancy_detection_spark.sources.sinks import compact_small_files

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _md5s(path):
    return {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(os.path.join(path, "*.parquet"))
    }


@pytest.fixture()
def fragmented(spark, tmp_path):
    """One big file plus ten tiny append files — the post-ingest shape."""
    out = str(tmp_path / "orders_frag")
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    orders.coalesce(1).write.parquet(out)
    for k in range(10):
        (
            orders.filter(F.col("o_orderkey") % 10 == k)
            .limit(40)
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    return out, orders


def test_small_runs_merge_and_big_files_keep_their_bytes(spark, fragmented):
    out, orders = fragmented
    pre = spark.read.parquet(out)
    n_pre = pre.count()
    want = sorted(
        (r.o_orderkey, r.o_custkey) for r in pre.select("o_orderkey", "o_custkey").collect()
    )
    before = _md5s(out)
    sizes = {f: os.path.getsize(f) for f in before}
    big = max(sizes, key=sizes.get)

    # target sized so the one real file is "big" and the appends are small
    report = compact_small_files(
        spark, out, target_file_bytes=sizes[big] * 2, small_ratio=0.5
    )
    assert report["bins"] >= 1
    assert report["files_before"] == 11
    after = _md5s(out)
    assert after[big] == before[big]  # the big file was never touched
    assert len(after) == report["files_after"] < 11

    back = spark.read.parquet(out)
    assert back.count() == n_pre
    got = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in back.select("o_orderkey", "o_custkey").collect()
    )
    assert got == want

    # reruns converge: the big file's name can split the smalls into two
    # runs on pass 1, whose outputs merge on pass 2; a fixpoint follows
    for _ in range(3):
        again = compact_small_files(
            spark, out, target_file_bytes=sizes[big] * 2, small_ratio=0.5
        )
        if again["bins"] == 0:
            break
    assert again["bins"] == 0
    stable = _md5s(out)
    assert stable[big] == before[big]
    final = compact_small_files(
        spark, out, target_file_bytes=sizes[big] * 2, small_ratio=0.5
    )
    assert final["bins"] == 0 and _md5s(out) == stable
    back2 = spark.read.parquet(out)
    assert back2.count() == n_pre


def test_merged_footer_range_is_union_of_adjacent_inputs(spark, fragmented):
    import pyarrow.parquet as pq

    out, _ = fragmented
    sizes = {f: os.path.getsize(f) for f in glob.glob(f"{out}/*.parquet")}
    big = max(sizes, key=sizes.get)
    smalls = sorted(f for f in sizes if f != big)

    def rng(files):
        lo, hi = None, None
        for f in files:
            md = pq.ParquetFile(f).metadata
            ci = [
                md.schema.column(i).path for i in range(md.num_columns)
            ].index("o_orderkey")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    per_file = {f: rng([f]) for f in smalls}
    compact_small_files(spark, out, target_file_bytes=sizes[big] * 2)
    merged = glob.glob(f"{out}/compact-*.parquet")
    assert merged
    # only runs of >=2 ADJACENT smalls merge, and adjacency is name order
    # over random part-file UUIDs — the big file's name can isolate one
    # small into a 1-file run that (correctly) stays unmerged. The
    # contract is therefore: merged footers span exactly the smalls that
    # were consumed (gone from disk), ranges of survivors excluded.
    consumed = [per_file[f] for f in smalls if not os.path.exists(f)]
    assert consumed
    want = (min(lo for lo, _ in consumed), max(hi for _, hi in consumed))
    assert rng(merged) == want


def test_crash_recovery_rolls_forward_and_back(spark, fragmented):
    out, _ = fragmented
    files = sorted(glob.glob(f"{out}/*.parquet"))
    n_pre = spark.read.parquet(out).count()

    # ROLL BACK: marker exists, final never landed -> originals must survive
    ghost = os.path.join(out, "compact-deadbeef.parquet")
    marker = ghost + ".__commit__"
    json.dump({"final": ghost, "originals": files[:2]}, open(marker, "w"))
    report = compact_small_files(spark, out, target_file_bytes=2)
    assert not os.path.exists(marker)
    assert all(os.path.exists(f) for f in files[:2])

    # ROLL FORWARD: final landed, originals not yet deleted -> dedup them.
    # Stage: copy one small file to the "final" name and leave the marker.
    import shutil as sh

    victim = files[1]
    final2 = os.path.join(out, "compact-cafebabe.parquet")
    sh.copyfile(victim, final2)
    json.dump(
        {"final": final2, "originals": [victim]},
        open(final2 + ".__commit__", "w"),
    )
    compact_small_files(spark, out, target_file_bytes=2)
    assert not os.path.exists(victim)
    assert os.path.exists(final2)
    assert not os.path.exists(final2 + ".__commit__")
    # same rows as before the staged "crash": the copy replaced the victim
    assert spark.read.parquet(out).count() == n_pre


def test_partitioned_layout_bins_never_cross_partition_dirs(spark, tmp_path):
    """Hive-partitioned layout: the partition value lives in the DIRECTORY
    name, so a bin spanning two partition dirs would silently re-label
    every row of the second partition. Runs must break at dir changes."""
    out = str(tmp_path / "orders_part")
    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    # several tiny append files inside EACH partition directory
    for k in range(4):
        (
            orders.filter(F.col("o_orderkey") % 4 == k)
            .limit(60)
            .coalesce(1)
            .write.mode("append")
            .partitionBy("o_orderstatus")
            .parquet(out)
        )
    pre = spark.read.parquet(out)
    want = sorted(
        (r.o_orderkey, r.o_orderstatus)
        for r in pre.select("o_orderkey", "o_orderstatus").collect()
    )

    # everything is "small": without the dir break, the sorted file walk
    # would pack the last files of partition A with the first of B
    report = compact_small_files(
        spark, out, target_file_bytes=1 << 30, small_ratio=1.0
    )
    assert report["bins"] >= 1

    got = sorted(
        (r.o_orderkey, r.o_orderstatus)
        for r in spark.read.parquet(out)
        .select("o_orderkey", "o_orderstatus")
        .collect()
    )
    assert got == want  # no row changed partition
    # and every merged file sits inside a partition dir it was built from
    for f in glob.glob(f"{out}/**/compact-*.parquet", recursive=True):
        assert "o_orderstatus=" in os.path.dirname(f)
