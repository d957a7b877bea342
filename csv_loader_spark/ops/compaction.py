"""Small-file compaction: the janitorial op every 100 TB lake needs.

Streaming ingestion and fine-grained partitioning both produce many small
files; scans then pay per-file open cost and lose columnar compression.
Compaction rewrites a (partition of a) dataset into ~target-sized files.

Shape: size the output file count from the actual input bytes (listed
driver-side, cheap), then rewrite with a per-partition coalesce. The
rewrite is offline-idempotent: write to a temp dir, then atomically swap —
never in place.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _recover_interrupted_swap(path: str) -> None:
    """Make a previous crashed run harmless before starting a new one.

    The swap sequence is: write tmp → rename(path, backup) →
    rename(tmp, path) → rmtree(backup). A crash can leave exactly three
    observable states, each with one safe recovery:

    - backup exists, path MISSING: crashed mid-swap — roll back
      (rename backup → path); any tmp is an unswapped rewrite, drop it.
    - backup exists, path exists: crashed after the swap completed but
      before cleanup — the new data is live; just drop the backup.
    - tmp exists (no backup): crashed during/after the rewrite, before
      any rename — drop the stale tmp.

    tmp and backup are siblings of ``path`` so every rename stays on one
    filesystem (os.rename is atomic there; cross-fs it would raise EXDEV).
    """
    tmp = path.rstrip("/") + "._compacting"
    backup = path.rstrip("/") + "._precompact"
    if os.path.exists(backup):
        if os.path.exists(path):
            shutil.rmtree(backup)
        else:
            os.rename(backup, path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet dataset into ceil(bytes/target) files; returns the
    new file count. Optional sort improves encoding + min/max skipping.

    Local-filesystem implementation (os.walk + atomic rename); on object
    stores the same shape runs against the FileSystem API."""
    _recover_interrupted_swap(path)
    n_files = max(1, math.ceil(_dir_bytes(path) / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + "._compacting"
    out.write.mode("overwrite").parquet(tmp)
    backup = path.rstrip("/") + "._precompact"
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return n_files
