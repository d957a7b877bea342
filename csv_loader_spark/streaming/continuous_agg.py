"""Continuous aggregate: a streaming-maintained hourly rollup table
(the incremental form of q65's hypertable rollup).

Pattern: per micro-batch, aggregate the batch into MERGEABLE partials
(count/sum — avg and friends derive at read time), merge them with the
affected day-partitions of the sink table, and rewrite just those
partitions (dynamic partition overwrite). The full fact table is never
re-read — cost per batch is O(batch + touched partitions).

Exactly-once: foreachBatch can re-deliver a batch after a failure, and a
naive merge would double-count. A `_applied_batches` ledger inside the sink
directory records committed batch ids; re-delivered batches are skipped.
(The ledger write happens after the partition overwrite — a crash between
the two re-applies the merge over the already-merged partials, which the
ledger check prevents from compounding only if the overwrite finished; the
window is the same one Delta's txn log closes — documented limitation of a
plain-parquet sink.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _ledger_path(out_path: str) -> str:
    return os.path.join(out_path, "_applied_batches")


def _already_applied(out_path: str, batch_id: int) -> bool:
    p = _ledger_path(out_path)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        return str(batch_id) in f.read().split()


def _record_applied(out_path: str, batch_id: int) -> None:
    os.makedirs(out_path, exist_ok=True)
    with open(_ledger_path(out_path), "a") as f:
        f.write(f"{batch_id}\n")


def start_hourly_rollup(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
) -> StreamingQuery:
    """events (streaming: ts, event_type, value) → parquet rollup table at
    ``out_path`` partitioned by day, columns (day, hour, event_type,
    n_events, sum_value), incrementally maintained."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        if _already_applied(out_path, batch_id):
            return
        partial = batch_df.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        partial = partial.persist()
        try:
            days = [r["day"] for r in partial.select("day").distinct().collect()]
            if not days:
                _record_applied(out_path, batch_id)
                return
            merged = partial
            has_table = os.path.exists(out_path) and any(
                d.startswith("day=") for d in os.listdir(out_path)
            )
            if has_table:
                existing = spark.read.parquet(out_path).filter(F.col("day").isin(days))
                merged = existing.select(partial.columns).unionAll(partial)
            merged = merged.groupBy("day", "hour", "event_type").agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
            # materialize BEFORE the write: the plan reads out_path and the
            # write overwrites out_path — lazy evaluation during the
            # overwrite would race the delete of its own input files
            merged = merged.localCheckpoint(eager=True)
            # writer-scoped dynamic overwrite (r12, matching changelog.py):
            # a session-conf set leaks dynamic semantics into every later
            # partitioned overwrite in the session
            merged.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("day").parquet(out_path)
            _record_applied(out_path, batch_id)
        finally:
            partial.unpersist()

    writer = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_priority_view(
    orders: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming twin of q217's incremental-view merge: maintain the
    per-priority (n_orders, sum_cents, min_cents, max_cents) view over a
    stream of orders rows (o_orderpriority, o_totalprice) using the SAME
    ``ivm_partial``/``ivm_merge`` pair the batch query proves against its
    full-recompute oracle — so stream-merged == full recompute is a
    theorem about those two functions, tested in
    tests/test_continuous_agg.py, not a separate implementation.

    Per batch: aggregate the batch to partial states (map-side
    combinable), union with the current view (|priorities| rows — the
    fact table is never re-read), merge, overwrite. Same exactly-once
    ledger as :func:`start_hourly_rollup`."""
    from csv_loader_spark.queries.analytics3 import ivm_merge, ivm_partial

    # SIBLING-dir ledger (r15): the view write below is a FULL overwrite
    # of out_path, which deletes a ledger kept inside it — after batch k
    # the ledger would record only batch k, so a fresh-checkpoint replay
    # re-applies every earlier batch and double-merges. (start_hourly_
    # rollup keeps its ledger inside out_path safely because its dynamic
    # partition overwrite never touches non-partition files; the
    # ks_drift monitor found the full-overwrite variant of the bug.)
    meta_path = out_path.rstrip("/") + "_meta"

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        if _already_applied(meta_path, batch_id) or _already_applied(
            out_path, batch_id
        ):  # second check: ledgers written by the pre-r15 layout
            return
        rows = batch_df.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        partial = ivm_partial(rows)
        has_table = os.path.exists(out_path) and any(
            f.endswith(".parquet") for f in os.listdir(out_path)
        )
        if has_table:
            existing = spark.read.parquet(out_path).select(partial.columns)
            partial = existing.unionByName(partial)
        merged = ivm_merge(partial)
        if not merged.take(1):
            _record_applied(meta_path, batch_id)
            return
        # materialize BEFORE the overwrite (the plan reads out_path)
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(out_path)
        _record_applied(meta_path, batch_id)

    writer = (
        orders.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
