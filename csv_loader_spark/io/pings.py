"""Reference-parity GPS-ping CSV ingestion (CsvLoader.java:72-194, ops 2-10).

The reference streams one CSV (plain / .gz / first-entry-of-.zip), projects
positionally with a per-record schema-variant switch, casts, drops malformed
rows, parses 3 timestamp formats, and truncates decimal id strings to int64 —
all single-threaded. Here the same semantics are a declarative DataFrame
chain: Catalyst fuses project+cast+filter into one whole-stage-codegen pass,
and the scan parallelizes per file split (plain CSV splits; .gz/.zip stay
single-task per file — same constraint as the reference, noted in SURVEY §7.4).

Layout (CsvLoader.java:120-127): col0=time, col1=vehicle_id, col2=lat,
col3=lon; records wider than 9 fields use col9=lat, col10=lon instead,
decided PER RECORD. NB the reference README documents a different column
order than the code; the code is authoritative (SURVEY §1.3).

Documented divergences from the reference (SURVEY §7.4):
- non-numeric vehicle_id: reference ABORTS the whole load (uncaught
  NumberFormatException, CsvLoader.java:146); we drop the row.
- ids wider than 38 digits: reference wraps arbitrary-precision; we NULL→drop
  (DecimalType(38,0) bound).
- a record with >=10 fields whose field 9 or 10 is EMPTY dispatches narrow
  here (Spark's CSV reader folds empty and absent fields both to NULL);
  the reference dispatches wide and then drops it on Double.parseDouble("").
  Either way the row only survives if its narrow lat/lon parse — a row can
  survive here that the reference drops, only when fields 2/3 are also valid
  doubles. Recorded, not observable in any fixture corpus.
- format-2 timestamps (no offset) use UTC, not the JVM default TZ.
- a UTF-8 BOM is stripped by Spark's CSV reader, so a BOM-prefixed first
  row parses normally here; the reference would prepend the BOM to the
  timestamp string, fail the parse, and drop that one row. Strictly more
  data retained; noted.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csv_loader_spark.functions.ids import decimal_str_to_int64
from csv_loader_spark.functions.timestamps import parse_time_to_millis

# Widest layout the reference addresses is 11 fields (col10 = wide lon).
N_RAW_COLS = 11

RAW_SCHEMA = T.StructType(
    [T.StructField(f"_c{i}", T.StringType()) for i in range(N_RAW_COLS)]
)

# Clean output schema (FIXTURES.md §A): the reference's implicit typed tuple
# plus the raw id string (needed for the dual distinct metric, op 11).
PING_SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id_str", T.StringType()),
        T.StructField("vehicle_id", T.LongType()),
        T.StructField("ts_millis", T.LongType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


def _extract_first_zip_entry(path: str, workdir: str | None = None) -> str:
    """Materialize ONLY the first entry of a .zip (CsvLoader.java:84-88 reads
    `zf.entries().nextElement()` once — later entries are ignored by design).

    Driver-side: zip has no splittable codec in Hadoop anyway, so a 1-file
    staging copy costs the same one pass the reference pays.
    """
    out_dir = workdir or tempfile.mkdtemp(prefix="csv_loader_zip_")
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()  # central-directory order == Java's entries()
        if not names:
            raise ValueError(f"zip archive has no entries: {path}")
        first = names[0]
        out_path = os.path.join(out_dir, "first_entry.csv")
        with zf.open(first) as src, open(out_path, "wb") as dst:
            shutil.copyfileobj(src, dst)
    return out_path


def read_pings_raw(
    spark: SparkSession, path: str, *, multiline: bool = True
) -> DataFrame:
    """Suffix-dispatch source (ops 2-5): plain / .gz / .zip-first-entry → raw
    11-column string DataFrame (absent trailing fields are NULL).

    Spark decompresses .gz by extension natively; .zip is staged driver-side.
    Suffix match is case-insensitive like the reference (:84,:90).

    ``multiline=True`` (default) is full RFC 4180: quoted fields may embed
    newlines, exactly like the reference's commons-csv — but it makes every
    file a single task (records can span split boundaries). At 100 TB, if
    the producer guarantees no embedded newlines (GPS pings never have
    them), pass ``multiline=False`` for splittable parallel scans — the
    one semantics-vs-scale switch in this source.
    """
    lower = path.lower()
    if lower.endswith(".zip"):
        path = _extract_first_zip_entry(path)
    return spark.read.csv(
        path,
        schema=RAW_SCHEMA,
        header=False,
        mode="PERMISSIVE",
        encoding="UTF-8",
        multiLine=multiline,
        escape='"',  # RFC 4180 doubled-quote escaping ("" inside a quoted
        # field), like commons-csv; Spark's default escape is backslash
    )


def project_pings(raw: DataFrame) -> DataFrame:
    """Ops 6-10 as one declarative chain: variant projection, double cast,
    malformed drop, multi-format time parse, id truncation.

    All null-producing casts happen in one projection; the single trailing
    filter is the reference's catch-and-continue (CsvLoader.java:131-143)
    expressed as predicate pushdown fodder.
    """
    # Per-record variant switch (CsvLoader.java:124-127): any evidence of a
    # >9-field record routes lat/lon to cols 9/10.
    wide = F.col("_c9").isNotNull() | F.col("_c10").isNotNull()
    lat_str = F.when(wide, F.col("_c9")).otherwise(F.col("_c2"))
    lon_str = F.when(wide, F.col("_c10")).otherwise(F.col("_c3"))

    projected = raw.select(
        F.col("_c1").alias("vehicle_id_str"),
        decimal_str_to_int64(F.col("_c1")).alias("vehicle_id"),
        parse_time_to_millis(F.col("_c0")).alias("ts_millis"),
        lat_str.try_cast("double").alias("lat"),
        lon_str.try_cast("double").alias("lon"),
    )
    return projected.filter(
        F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
        & F.col("ts_millis").isNotNull()
        & F.col("vehicle_id").isNotNull()
    )


def rejected_pings(raw: DataFrame) -> DataFrame:
    """The rows `project_pings` drops, with a reason column — the reference
    prints these and continues (CsvLoader.java:133,141); we keep them
    queryable (a strict superset of the reference's stdout log)."""
    wide = F.col("_c9").isNotNull() | F.col("_c10").isNotNull()
    lat = F.when(wide, F.col("_c9")).otherwise(F.col("_c2")).try_cast("double")
    lon = F.when(wide, F.col("_c10")).otherwise(F.col("_c3")).try_cast("double")
    ts = parse_time_to_millis(F.col("_c0"))
    vid = decimal_str_to_int64(F.col("_c1"))
    reason = (
        F.when(lat.isNull() | lon.isNull(), F.lit("bad_latlon"))
        .when(ts.isNull(), F.lit("bad_time"))
        .otherwise(F.lit("bad_vehicle_id"))
    )
    return raw.filter(
        lat.isNull() | lon.isNull() | ts.isNull() | vid.isNull()
    ).withColumn("reject_reason", reason)


def read_pings(spark: SparkSession, path: str) -> DataFrame:
    """Full batch ingestion: source → clean typed pings (PING_SCHEMA)."""
    return project_pings(read_pings_raw(spark, path))


def ordered_per_vehicle(pings: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Restore the ordering guarantee downstream map-matching needs.

    The reference emits rows in file order (single-threaded); a parallel
    Spark read does not. Global order is neither needed nor scalable — what
    matters is PER-VEHICLE time order, which this provides by partitioning
    on vehicle_id and sorting within partitions (one shuffle, no global
    sort; SURVEY §7.4.5). Iterating any partition yields each vehicle's
    pings contiguously and time-ascending."""
    parts = [F.col("vehicle_id")]
    df = (
        pings.repartition(num_partitions, *parts)
        if num_partitions
        else pings.repartition(*parts)
    )
    return df.sortWithinPartitions("vehicle_id", "ts_millis")


def distinct_vehicle_counts(pings: DataFrame) -> DataFrame:
    """Op 11: the reference's dual exact distinct metric (string ids vs
    truncated int64 ids — the pair exposes >64-bit truncation collisions,
    CsvLoader.java:105-106,165). One row: (n_records, n_vehicles, n_ids)."""
    return pings.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct("vehicle_id_str").alias("n_vehicles"),
        F.countDistinct("vehicle_id").alias("n_ids"),
    )
