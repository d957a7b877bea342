"""Bucketed-table co-located joins: the zero-shuffle fact⋈fact path.

Every fact-fact join in the query library (orders⋈lineitem on orderkey)
shuffles both sides on the key. At 100 TB that shuffle IS the query cost.
The standard fix is to land both tables bucketed by the join key: Spark
records bucket spec in the catalog, and a join on the bucket key reads
matching buckets side by side — no Exchange on either side
(`tests/test_bucketing.py` asserts the plan).

Sizing at scale: pick bucket count so one bucket of the BIG side is
~128-512 MB (e.g. 100 TB lineitem → ~250k buckets); both tables must use
the same count (or an integer multiple with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int,
    *,
    sort_by: str | None = None,
) -> None:
    """Land a DataFrame as a bucketed (and optionally sort-bucketed) catalog
    table; sorting within buckets additionally unlocks sort-merge without a
    per-task sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous run can leave an orphan managed-table location that
    # blocks re-creation; clear it (local-fs warehouses only)
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two previously-bucketed catalog tables on their bucket key —
    planner produces a shuffle-free SortMergeJoin when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
