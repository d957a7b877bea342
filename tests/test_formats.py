"""Format breadth: the engine's tables round-trip through the other
Spark-native storage/interchange formats without loss.

- ORC: columnar alternative to parquet (built into Spark) — full-table
  equality after write/read, plus predicate pushdown reaching the ORC
  scan (the property that makes the format usable at scale, not just
  readable).
- JSON Lines: the interchange format training-data pipelines ingest
  from; schema-pinned read-back (no sampling inference at scale) must
  reproduce every row, including the nested props string.
- CSV with explicit schema + header round-trip for the narrow table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(src, "o_orderkey")
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("o_orderkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan


def test_jsonl_roundtrip_schema_pinned(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    src.write.json(path)  # JSON Lines, one object per line
    # schema PINNED on read — at 100 TB you never let Spark sample-infer
    back = spark.read.schema(src.schema).json(path)
    assert _sorted_rows(back, "doc_id") == _sorted_rows(src, "doc_id")


def test_csv_roundtrip_with_header(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/region.parquet")
    path = str(tmp_path / "region_csv")
    src.write.option("header", True).csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert _sorted_rows(back, "r_regionkey") == _sorted_rows(src, "r_regionkey")
