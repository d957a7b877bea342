"""SparkSession construction tuned for this engine.

Local testing runs on ``local[N]`` but every default here is chosen to also be
sane on a real multi-executor cluster: AQE on (runtime coalesce + skew-join
handling), UTC session timezone (deterministic timestamp semantics — the
reference's format-2 parse used the JVM default TZ, which we deliberately pin
to UTC, see SURVEY.md §7.4), Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "csv_loader_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count — at cluster scale
    AQE coalesces post-shuffle partitions anyway, so the static number only
    sets the upper bound for the local runs.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # Discover the vendored protobuf runtime BEFORE the JVM starts so the
    # Python workers inherit it via PYTHONPATH — unblocks the
    # transformWithStateInPandas protocol (see streaming/trips.py).
    from csv_loader_spark.streaming.trips import ensure_protobuf

    ensure_protobuf()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark's stock 10 MB, set explicitly to pin it: an earlier 64 MB
        # override let the sf0.1 lineitem FACT (10.3 MB) ride the broadcast
        # path in q03/q05 — contrary to those queries' documented
        # shuffle-on-orderkey scale shape, measurably slower locally
        # (q05 0.66 s -> 0.59 s median once the fact shuffles), and
        # divergent from the verification driver's session, which runs on
        # the stock default. Dims broadcast explicitly via F.broadcast()
        # hints, which ignore this threshold.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Scan-split granularity: the benchmark tables are single small
        # parquet files, which at the 128 MB default become ONE input
        # partition — a 1-task scan on a 32-core executor. 4 MB keeps local
        # scans parallel. At cluster scale raise this back to 128-256 MB
        # (SPARK_GRAFT_MAX_PARTITION_BYTES) — 4 MB over 100 TB would mean
        # 25M tasks, pure scheduler overhead.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # catalog tables (bucketing demos/tests) land outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session.

    The verification driver hands us its own SparkSession; timestamp semantics
    must still be deterministic (UTC), and AQE should be on. Only runtime SQL
    confs are touched here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet stores TIMESTAMP(NANOS); read as int64 (see io.tables).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The regenerated testdata writes timestamps as TIMESTAMP(MICROS,
    # isAdjustedToUTC=false); by default Spark ≥3.4 infers those as
    # TIMESTAMP_NTZ, which breaks watermarks/unix_micros AND hides the
    # column behind a cast that defeats parquet predicate pushdown. With
    # inference off the scan yields TimestampType directly (session TZ is
    # UTC, so the instant matches DuckDB's naive rendering) and shipdate/
    # orderdate filters stay in PushedFilters.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark
