"""Targeted deletion (right-to-be-forgotten): footer-pruned file surgery.

The scale contract under test: on a range-sorted layout, deleting a
clustered key set rewrites ONLY the files whose footer ranges can
contain the keys — every other file keeps its exact bytes — and a
rerun of the same request is an idempotent no-op.
"""

from __future__ import annotations

import glob
import hashlib
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.sources.readers import table
from big_data_occupancy_detection_spark.sources.sinks import (
    delete_keys_parquet,
    write_range_sorted_parquet,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
N_FILES = 8


def _file_md5s(path):
    return {
        f: hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(os.path.join(path, "*.parquet"))
    }


@pytest.fixture()
def laid_out(spark, tmp_path):
    out = str(tmp_path / "orders_sorted")
    orders = table(spark, SF_DIR, "orders")
    write_range_sorted_parquet(orders, out, ["o_custkey"], num_files=N_FILES)
    return out


def test_clustered_keys_touch_only_their_files(spark, laid_out):
    out = laid_out
    before = _file_md5s(out)
    assert len(before) == N_FILES
    pre = spark.read.parquet(out)
    n_pre = pre.count()
    # three custkeys from the BOTTOM of the range: they live in file 1
    keys = [
        r.o_custkey
        for r in pre.select("o_custkey").distinct().orderBy("o_custkey").take(3)
    ]
    n_victim = pre.filter(F.col("o_custkey").isin(keys)).count()
    assert n_victim > 0

    # snapshot for the oracle before mutating
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT o_orderkey, o_custkey FROM read_parquet('{out}/*.parquet')
            WHERE o_custkey NOT IN ({",".join(map(str, keys))})
            ORDER BY o_orderkey"""
    ).fetchall()

    report = delete_keys_parquet(spark, out, "o_custkey", keys)
    assert report["rows_deleted"] == n_victim
    assert report["files_total"] == N_FILES
    # clustered keys -> at most 2 of 8 files rewritten, none emptied
    assert 1 <= report["files_rewritten"] <= 2
    assert report["files_deleted"] == 0

    after = _file_md5s(out)
    untouched = [f for f in after if after[f] == before.get(f)]
    assert len(untouched) == N_FILES - report["files_rewritten"]

    back = spark.read.parquet(out)
    assert back.count() == n_pre - n_victim
    assert back.filter(F.col("o_custkey").isin(keys)).count() == 0
    got = sorted(
        (r.o_orderkey, r.o_custkey)
        for r in back.select("o_orderkey", "o_custkey").collect()
    )
    assert got == [tuple(r) for r in want]


def test_rerun_is_an_idempotent_noop(spark, laid_out):
    out = laid_out
    keys = [
        r.o_custkey
        for r in spark.read.parquet(out)
        .select("o_custkey").distinct().orderBy("o_custkey").take(3)
    ]
    first = delete_keys_parquet(spark, out, "o_custkey", keys)
    assert first["rows_deleted"] > 0
    mid = _file_md5s(out)
    second = delete_keys_parquet(spark, out, "o_custkey", keys)
    assert second["rows_deleted"] == 0
    assert second["files_rewritten"] == 0
    assert _file_md5s(out) == mid


def test_emptying_a_file_removes_it(spark, laid_out):
    out = laid_out
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    # every key in the lowest-range file -> that file ends up empty
    victim = min(files, key=lambda f: spark.read.parquet(f)
                 .agg(F.min("o_custkey")).collect()[0][0])
    keys = [
        r.o_custkey
        for r in spark.read.parquet(victim).select("o_custkey").distinct().collect()
    ]
    n_victim_rows = spark.read.parquet(victim).count()
    pre_total = spark.read.parquet(out).count()
    report = delete_keys_parquet(spark, out, "o_custkey", keys)
    assert not os.path.exists(victim)
    assert report["files_deleted"] == 1
    # range files are disjoint on the sort key, so ONLY that file changed
    assert report["rows_deleted"] == n_victim_rows
    assert spark.read.parquet(out).count() == pre_total - n_victim_rows


def test_no_keys_or_missing_column_edges(spark, laid_out):
    out = laid_out
    rep = delete_keys_parquet(spark, out, "o_custkey", [])
    assert rep["rows_deleted"] == 0 and rep["files_rewritten"] == 0
    with pytest.raises(Exception, match="o_nope"):
        delete_keys_parquet(spark, out, "o_nope", [1])


def test_nested_column_before_key_does_not_shift_stats_lookup(spark, tmp_path):
    """Regression: row-group stats are ordered by physical LEAF column,
    so a map/struct field ahead of the key must not make the prune read
    another column's min/max (which could wrongly skip a file)."""
    out = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [(({"a": "x"}), 9_000_000 + i, i) for i in range(100)],
        "props map<string,string>, big bigint, k bigint",
    )
    # one file whose `big` range (9e6..) would NOT overlap the keys —
    # reading big's stats for k would prune the file and miss the delete
    df.coalesce(1).write.parquet(out)
    rep = delete_keys_parquet(spark, out, "k", [5, 6, 7])
    assert rep["rows_deleted"] == 3
    back = spark.read.parquet(out)
    assert back.count() == 97
    assert back.filter(F.col("k").isin([5, 6, 7])).count() == 0


def test_crash_stranded_temp_is_hidden_and_scrubbed(spark, laid_out):
    """A crash between write_table(tmp) and rename leaves the filtered
    copy under the dot-prefixed temp name: Spark's listing must never
    read it as data (no double counting) and a rerun must scrub it."""
    import shutil

    out = laid_out
    files = sorted(glob.glob(f"{out}/*.parquet"))
    n_pre = spark.read.parquet(out).count()
    victim = files[0]
    tmp = os.path.join(out, "." + os.path.basename(victim) + ".__del__")
    shutil.copyfile(victim, tmp)

    # hidden from the reader: row count unchanged despite the stray copy
    assert spark.read.parquet(out).count() == n_pre

    keys = [
        r.o_custkey
        for r in spark.read.parquet(out)
        .select("o_custkey")
        .distinct()
        .orderBy("o_custkey")
        .take(1)
    ]
    rep = delete_keys_parquet(spark, out, "o_custkey", keys)
    assert not os.path.exists(tmp)  # scrubbed on entry
    assert rep["rows_deleted"] > 0
    assert (
        spark.read.parquet(out).filter(F.col("o_custkey").isin(keys)).count()
        == 0
    )
