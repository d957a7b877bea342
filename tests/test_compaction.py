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
