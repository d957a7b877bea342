"""Compaction: many small files → few target-sized files, data preserved."""

import glob

from csv_loader_spark.ops.compaction import compact_parquet


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before = len(glob.glob(f"{path}/part-*"))
    assert before == 40
    total_before = spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0]

    n = compact_parquet(spark, path, target_file_mb=256, sort_by=["id"])
    assert n == 1
    after = glob.glob(f"{path}/part-*")
    assert len(after) == 1
    assert spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0] == total_before
    assert spark.read.parquet(path).count() == 10_000


def test_compact_recovers_from_crashed_swap_states(spark, tmp_path):
    """Each crash window in the swap sequence must self-heal on the next
    run: mid-swap (backup present, live dir missing) rolls back, post-swap
    (backup + live both present) drops the backup, stale tmp is removed."""
    import os
    import shutil

    path = str(tmp_path / "ds")
    spark.range(1_000).selectExpr("id", "id * 3 AS v").repartition(8).write.parquet(path)
    total = spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0]
    backup, tmp = path + "._precompact", path + "._compacting"

    # crash between rename(path, backup) and rename(tmp, path)
    os.rename(path, backup)
    os.makedirs(tmp)  # half-written rewrite
    assert compact_parquet(spark, path, target_file_mb=256) == 1
    assert not os.path.exists(backup) and not os.path.exists(tmp)
    assert spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0] == total

    # crash between rename(tmp, path) and rmtree(backup)
    shutil.copytree(path, backup)
    assert compact_parquet(spark, path, target_file_mb=256) == 1
    assert not os.path.exists(backup)
    assert spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0] == total

    # crash before any rename: stale tmp only
    os.makedirs(tmp)
    assert compact_parquet(spark, path, target_file_mb=256) == 1
    assert not os.path.exists(tmp)
    assert spark.read.parquet(path).agg({"v": "sum"}).collect()[0][0] == total
