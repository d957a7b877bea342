"""Incrementally-maintained trailing-window distinct actives — the
streaming twin of q229_rolling_actives (rolling 7-day "WAU" per day).

Pattern (the continuous_agg/changelog family): per micro-batch,

1. reduce the batch to DISTINCT (day, user) pairs and merge them into a
   day-partitioned pair store (dynamic partition overwrite — only the
   touched day partitions rewrite; the store is the minimal sufficient
   state for a trailing distinct count, already deduplicated so a day's
   partition is bounded by |users|, not |events|);
2. recompute the answer ONLY for affected output days: the trailing
   window of each touched day, plus the days newly un-clipped because
   the observed max day advanced (q229 clips its emission at the last
   observed day — when the stream extends that horizon, previously
   invisible days become answerable from OLD pairs without being
   touched this batch);
3. splice the fresh rows into the (day, active_users) answer table —
   calendar-sized, so the splice is a full rewrite of a tiny table.

Exactly-once: the continuous_agg `_applied_batches` ledger skips
re-delivered batches; every merge step is idempotent (distinct-union
into the pair store, recompute-and-replace of affected days), so a
crash between the store write and the ledger record replays safely.

Cost per batch: O(batch) + O(touched-day partitions) + a window-of-7
recompute over pair partitions — never a full-history rescan. The
driver-side `collect()` of touched days is bounded by days-per-batch
(the continuous_agg convention), not data-sized.

Parity: tests/test_rolling_actives.py asserts the streamed answer table
equals q229's batch answer (and its DuckDB-oracle shape) over the same
rows, including across a restart."""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from csv_loader_spark.streaming.continuous_agg import (
    _already_applied,
    _record_applied,
)

#: default trailing window, matching q229
WINDOW_DAYS = 7

_DAY_FMT = "%Y-%m-%d"


def _meta_path(out_path: str) -> str:
    return os.path.join(out_path, "_last_day")


def _read_last_day(out_path: str) -> str | None:
    p = _meta_path(out_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        v = f.read().strip()
    return v or None


def _write_last_day(out_path: str, day: str) -> None:
    os.makedirs(out_path, exist_ok=True)
    with open(_meta_path(out_path), "w") as f:
        f.write(day)


def _day_range(a: str, b: str) -> list[str]:
    """Inclusive 'yyyy-MM-dd' day strings from a to b."""
    da = _dt.date.fromisoformat(a)
    db = _dt.date.fromisoformat(b)
    return [
        (da + _dt.timedelta(days=i)).strftime(_DAY_FMT)
        for i in range((db - da).days + 1)
    ]


def pairs_path(out_path: str) -> str:
    return os.path.join(out_path, "pairs")


def wau_path(out_path: str) -> str:
    return os.path.join(out_path, "wau")


def start_rolling_actives(
    events: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    *,
    days: int = WINDOW_DAYS,
    available_now: bool = False,
) -> StreamingQuery:
    """events (streaming: ts, user_id, …) → incrementally-maintained
    answer table at ``<out_path>/wau`` with columns (day, active_users):
    for every calendar day up to the last observed one, the distinct
    users active in the trailing ``days``-day window — exactly
    q229_rolling_actives' result, maintained per micro-batch."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        if _already_applied(out_path, batch_id):
            return
        pp = pairs_path(out_path)
        wp = wau_path(out_path)
        batch_pairs = (
            batch_df.select(
                F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                    "day"
                ),
                "user_id",
            )
            .distinct()
            .persist()
        )
        try:
            touched = [
                r["day"] for r in batch_pairs.select("day").distinct().collect()
            ]
            if not touched:
                _record_applied(out_path, batch_id)
                return
            has_pairs = os.path.exists(pp) and any(
                d.startswith("day=") for d in os.listdir(pp)
            )
            merged = batch_pairs
            if has_pairs:
                existing = (
                    spark.read.parquet(pp)
                    .filter(F.col("day").isin(touched))
                    .select("day", "user_id")
                )
                merged = existing.unionAll(batch_pairs).distinct()
            # materialize BEFORE the write (the plan reads pp and the
            # write overwrites pp — the continuous_agg race note)
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("day").parquet(pp)

            old_max = _read_last_day(out_path)
            new_max = max(max(touched), old_max or min(touched))
            # affected output days: each touched day's forward window,
            # plus the newly un-clipped horizon (old_max, new_max]
            affected: set[str] = set()
            for t in touched:
                end = (
                    _dt.date.fromisoformat(t) + _dt.timedelta(days=days - 1)
                ).strftime(_DAY_FMT)
                affected.update(_day_range(t, end))
            if old_max is not None and new_max > old_max:
                nxt = (
                    _dt.date.fromisoformat(old_max) + _dt.timedelta(days=1)
                ).strftime(_DAY_FMT)
                affected.update(_day_range(nxt, new_max))
            affected = {a for a in affected if a <= new_max}
            aff = sorted(affected)
            need_from = (
                _dt.date.fromisoformat(aff[0]) - _dt.timedelta(days=days - 1)
            ).strftime(_DAY_FMT)
            src = spark.read.parquet(pp).filter(
                (F.col("day") >= need_from) & (F.col("day") <= aff[-1])
            )
            votes = src.select(
                F.explode(F.sequence(F.lit(0), F.lit(days - 1))).alias("i"),
                "day",
                "user_id",
            ).select(
                F.date_format(
                    F.date_add(F.to_date("day"), F.col("i")), "yyyy-MM-dd"
                ).alias("day"),
                "user_id",
            ).filter(F.col("day").isin(aff))
            fresh = votes.groupBy("day").agg(
                F.count_distinct("user_id").cast("long").alias("active_users")
            )
            result = fresh
            if os.path.exists(wp):
                kept = spark.read.parquet(wp).filter(~F.col("day").isin(aff))
                result = kept.select(fresh.columns).unionAll(fresh)
            result = result.localCheckpoint(eager=True)
            result.write.mode("overwrite").parquet(wp)
            _write_last_day(out_path, new_max)
            _record_applied(out_path, batch_id)
        finally:
            batch_pairs.unpersist()

    writer = (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
