"""Extension-dispatch batch reader + partitioned columnar writer.

The reference reads exactly one format (CSV, optionally gzip/zip —
`io/pings.py` owns that parity path). A usable engine also ingests the
formats a data platform actually lands: JSON lines, parquet, ORC, and CSV
with headers. One entry point, extension-dispatched, always returning a
DataFrame — Catalyst treats every source identically downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_any(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    header: bool = True,
    **options,
) -> DataFrame:
    """Read csv/.csv.gz/json/jsonl/parquet/orc by extension.

    Compressed json/csv decompress by extension natively (gzip is
    unsplittable → 1 task per file, same constraint as the reference;
    convert to parquet for scale)."""
    name = os.path.basename(path).lower()
    for gz in (".gz", ".bz2", ".zst"):
        if name.endswith(gz):
            name = name[: -len(gz)]
    ext = name.rsplit(".", 1)[-1]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if ext == "csv":
        return reader.csv(path, header=header, **options)
    if ext in ("json", "jsonl", "ndjson"):
        return reader.json(path, **options)
    if ext == "parquet":
        return reader.parquet(path, **options)
    if ext == "orc":
        return reader.orc(path, **options)
    raise ValueError(f"unsupported extension: {path}")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    *,
    fmt: str = "parquet",
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Land a table partitioned by low-cardinality keys (e.g. day, lang) —
    the layout that makes downstream partition pruning free. Optional
    within-partition sort improves encoding + enables min/max skipping.

    Scale: one directory per partition value; keep cardinality ≤ ~10k and
    align partition keys with the dominant query filters."""
    out = df.sortWithinPartitions(*sort_within) if sort_within else df
    out.write.mode(mode).partitionBy(*partition_by).format(fmt).save(path)
