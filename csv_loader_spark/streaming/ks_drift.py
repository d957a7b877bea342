"""Streaming KS drift monitor — the live counterpart of q230_ks_drift:
per-(source, length) histogram partials maintained incrementally, with
the two-sample Kolmogorov-Smirnov statistic of every source against the
rest of the corpus re-emitted per trigger.

This closes the drift leg of the monitoring loop (gap_stats covers
inter-arrival regularity, cusum_monitor covers level shifts): a
curation pipeline watches each source's length distribution drift away
from the corpus as new crawls land.

Pattern (the continuous_agg / rolling_actives family — foreachBatch,
NOT applyInPandasWithState, because KS is a CROSS-source statistic:
every source's ECDF is compared against the pooled rest, so no
single-key state can see enough):

1. reduce the batch to its (source, v, c) length-histogram partial —
   the histogram is the minimal MERGEABLE sufficient statistic for the
   exact KS algebra (histograms over disjoint row sets merge by summing
   c per key);
2. merge the partial into the histogram store (|sources| x |distinct
   lengths| rows — value-domain-sized, so the merge rewrite is tiny; at
   an unbounded length domain, quantize v into fixed-width bins first,
   the q230 guidance);
3. recompute the answer table from the merged store with the SAME
   :func:`~csv_loader_spark.queries.analytics5.ks_from_length_counts`
   the batch query runs — stream-final == batch q230 is a theorem about
   that one shared function, not a parallel implementation
   (tests/test_ks_drift.py asserts it over the same rows).

Exactly-once: the continuous_agg `_applied_batches` ledger skips
re-delivered batches, so a replayed micro-batch cannot double-count
into the histogram (tested via a fresh-checkpoint re-run over the same
files).

Cost per batch: O(batch) map-side-combined partial + a histogram-sized
merge + the KS recompute over the histogram — the document stream is
never re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from csv_loader_spark.streaming.continuous_agg import (
    _already_applied,
    _record_applied,
)


def start_ks_drift(
    docs: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
) -> StreamingQuery:
    """docs (streaming: source string, n_chars long) → maintains the
    (source, v, c) histogram store at ``store_path`` and the
    (source, n_docs, ks) answer table at ``out_path``."""
    from csv_loader_spark.queries.analytics5 import ks_from_length_counts

    # the ledger lives in a SIBLING dir: the store write is a full
    # overwrite, which would delete a ledger kept inside store_path —
    # leaving only the latest batch id recorded, so a fresh-checkpoint
    # replay would re-apply every earlier batch and double-count
    # (caught by tests/test_ks_drift.py's redelivery case)
    meta_path = store_path.rstrip("/") + "_meta"

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        if _already_applied(meta_path, batch_id):
            return
        partial = batch_df.groupBy(
            "source", F.col("n_chars").cast("long").alias("v")
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))
        has_store = os.path.exists(store_path) and any(
            f.endswith(".parquet") for f in os.listdir(store_path)
        )
        if has_store:
            existing = spark.read.parquet(store_path).select(partial.columns)
            partial = existing.unionByName(partial)
        merged = partial.groupBy("source", "v").agg(
            F.sum("c").cast("long").alias("c")
        )
        # materialize BEFORE the overwrite (the plan reads store_path)
        merged = merged.localCheckpoint(eager=True)
        if not merged.take(1):
            _record_applied(meta_path, batch_id)
            return
        merged.write.mode("overwrite").parquet(store_path)
        answer = ks_from_length_counts(merged).localCheckpoint(eager=True)
        answer.write.mode("overwrite").parquet(out_path)
        _record_applied(meta_path, batch_id)

    writer = (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
