"""Streaming ping ingestion (SURVEY §7.2 M3): readStream → parse chain →
foreachBatch HTTP sink, with checkpointed exactly-once source tracking.

The reference is a one-shot single-pass loader: a crash mid-file restarts
from scratch under a NEW sourceId (CsvLoader.java:63), and its only
backpressure is "the read loop blocks inside the POST retry" (:162,:200-233).
Structured Streaming upgrades both for free: the checkpoint makes source
progress exactly-once (re-run resumes, no re-send of completed batches), and
micro-batch scheduling gives the same blocking backpressure per batch.

Metrics (op 17): the reference prints cumulative records + dual exact
distinct-vehicle counts per flushed batch from unbounded in-memory HashSets
(:105-106,:165) — fine for one city's vehicles, not for 100 TB. Default
here is ``metrics="approx"``: per batch the executors build one
``hll_sketch_agg`` sketch per counter (DataSketches HLL, ~KB), the driver
unions it into a running cumulative sketch, and the printed count is the
estimate of the UNION — a true cumulative distinct over the whole load
(matching the reference's counter semantics within HLL error, ~2% at
lgConfigK=12), with bounded driver state and NO id-row materialization.
A ``max`` of per-batch counts would instead report the largest
single-batch cardinality and arbitrarily underestimate once batches carry
disjoint vehicles. ``metrics="exact"`` is the documented reference-parity
OPT-IN (it collect()s id pairs per batch and grows unbounded driver sets,
exactly like the reference's HashSets); ``metrics=None`` skips metrics
entirely.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from csv_loader_spark.io.pings import RAW_SCHEMA, project_pings
from csv_loader_spark.sinks.http import BATCH_SIZE, RETRY_INTERVAL_S, post_partition


def stream_pings(
    spark: SparkSession, src_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Incremental CSV source over a directory (new files = new data), same
    parse chain as batch ``read_pings`` — one code path, two execution modes."""
    reader = spark.readStream.schema(RAW_SCHEMA).option("encoding", "UTF-8")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.csv(
        src_dir, header=False, mode="PERMISSIVE", multiLine=True, escape='"'
    )
    return project_pings(raw)


@dataclass
class IngestMetrics:
    """Driver-side running metrics, printed per micro-batch like the
    reference's progress line (CsvLoader.java:165)."""

    records: int = 0
    vehicles_str: set = field(default_factory=set)
    vehicle_ids: set = field(default_factory=set)
    approx_vehicles: int = 0
    approx_ids: int = 0
    # cumulative DataSketches HLL sketches (bounded, ~KB each): the union
    # of every batch's sketch so far; approx_* above hold their estimates
    hll_vehicles: bytes | None = None
    hll_ids: bytes | None = None
    # highest batch_id whose metrics were applied: foreachBatch is
    # at-least-once (a failed/restarted batch REPLAYS under the same id),
    # and while set-union and HLL-union are idempotent under replay, the
    # ``records`` counter is not — a repeated id must not double-count
    last_batch_id: int | None = None

    def line(self, exact: bool) -> str:
        if exact:
            nv, ni = len(self.vehicles_str), len(self.vehicle_ids)
        else:
            nv, ni = self.approx_vehicles, self.approx_ids
        return (
            f"{self.records / 1e6:.2f}M records loaded, "
            f"{nv} unique vehicles ({ni} unique ids)"
        )


def update_batch_metrics(
    state: IngestMetrics, batch_df: DataFrame, batch_id: int, metrics: str
) -> None:
    """Apply one micro-batch's worth of progress metrics to ``state``.

    Replay-safe: foreachBatch is at-least-once, so after a failure/restart
    the same batch_id fires again with the same data. A repeated (or
    older) id is skipped entirely — set/HLL unions would tolerate the
    replay, but ``records += n`` would double-count, and a counter that
    looks exactly-once must be exactly-once. The progress line is still
    printed (the reference prints per flush, CsvLoader.java:165)."""
    replayed = state.last_batch_id is not None and batch_id <= state.last_batch_id
    if metrics == "exact":
        if not replayed:
            # reference-parity dual distinct (unbounded, like :105-106)
            ids = batch_df.select("vehicle_id_str", "vehicle_id").collect()
            state.records += len(ids)
            state.vehicles_str.update(r[0] for r in ids)
            state.vehicle_ids.update(r[1] for r in ids)
        print(state.line(exact=True), file=sys.stderr)
    elif metrics == "approx":
        if not replayed:
            # One mergeable HLL sketch per counter per batch (executor
            # side, partial-agg combined), unioned into the running
            # cumulative sketch so the printed number estimates the
            # distinct count over ALL batches — not max-of-batches,
            # which underestimates as soon as batches carry disjoint
            # vehicles. The union runs as a literal expression in the
            # same tiny one-row agg job; driver state stays ~KB.
            agg_df = batch_df.agg(
                F.count(F.lit(1)).alias("n"),
                F.hll_sketch_agg("vehicle_id_str").alias("sv"),
                F.hll_sketch_agg("vehicle_id").alias("si"),
            )
            if state.hll_vehicles is not None:
                agg_df = agg_df.select(
                    "n",
                    F.hll_union(F.lit(state.hll_vehicles), "sv").alias("sv"),
                    F.hll_union(F.lit(state.hll_ids), "si").alias("si"),
                )
            row = agg_df.select(
                "n",
                "sv",
                "si",
                F.hll_sketch_estimate("sv").alias("ev"),
                F.hll_sketch_estimate("si").alias("ei"),
            ).collect()[0]
            state.records += row["n"]
            # An empty batch yields an EMPTY sketch (not null), and
            # union(prev, empty) == prev — measured, so this null
            # guard is belt-and-braces against future null-propagating
            # expression changes, not a load-bearing branch.
            if row["sv"] is not None:
                state.hll_vehicles = bytes(row["sv"])
                state.hll_ids = bytes(row["si"])
                state.approx_vehicles = int(row["ev"])
                state.approx_ids = int(row["ei"])
        print(state.line(exact=False), file=sys.stderr)
    if not replayed:
        state.last_batch_id = batch_id


def write_stream_http(
    pings: DataFrame,
    url: str,
    source_id: int,
    checkpoint_dir: str,
    *,
    batch_size: int = BATCH_SIZE,
    retry_interval: float = RETRY_INTERVAL_S,
    max_retries: int | None = None,
    metrics: str | None = "approx",
    available_now: bool = False,
) -> tuple[StreamingQuery, IngestMetrics]:
    """foreachBatch → per-partition envelope POSTs (executor-side).

    ``available_now=True`` drains everything currently in the source then
    stops — the batch-equivalent trigger used by tests and backfills.
    """
    state = IngestMetrics()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        def _send(rows):
            post_partition(
                rows,
                url,
                source_id,
                batch_size=batch_size,
                retry_interval=retry_interval,
                max_retries=max_retries,
            )

        batch_df.persist()
        try:
            batch_df.foreachPartition(_send)
            if metrics in ("exact", "approx"):
                update_batch_metrics(state, batch_df, batch_id, metrics)
        finally:
            batch_df.unpersist()

    writer = (
        pings.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), state
