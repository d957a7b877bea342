"""Streaming SCD type-2 maintenance: q106's interval builder
incrementalized via applyInPandasWithState.

Batch q106 rebuilds the whole dimension history per run; a warehouse
maintains it INCREMENTALLY — each arriving event either extends the open
version (same attribute: nothing to do) or closes it and opens a new one.
State per user is exactly the open version: (attr, opened-at µs,
opener event_id) — three scalars plus the last folded (ts, event_id);
CLOSED versions are emitted as they close, formatted identically to
q106's closed rows, so the stream's cumulative output equals the batch
builder's output minus its CURRENT rows (asserted end-to-end by
tests/test_streaming_scd2.py). The open version lives only in state —
append-mode streaming cannot retract, so 'CURRENT' rows come from
``scd2_current_snapshot`` (r8): a batch read of the checkpoint's state
store (Spark's statestore data source) emitting them in q106's exact
shape, so stream output ∪ snapshot == batch q106, row for row.

Ordering: events are folded in (ts, event_id) order within each
micro-batch; across batches, per-user event-time order is assumed (the
CDC-feed convention). A late out-of-order event would need retraction,
which is the table-format layer's job (merge-on-read), not the stream's —
but the operator can SEE the violation (r8): state carries the last
folded (ts, event_id), and an event at-or-behind it is NOT folded; it is
emitted as a QUARANTINE row — ``valid_to IS NULL`` (closed versions
always carry both bounds), valid_from = the event's own timestamp — so
the feed bug surfaces as queryable rows instead of a corrupted interval
(tests/test_streaming_scd2.py::test_out_of_order_event_is_quarantined).

Scale: state is three scalars per DISTINCT user — dimension cardinality,
not event volume; Arrow-batched per group, no per-row Python overhead
beyond the fold itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, valid_from string, valid_to string, attr string"
)
# STATE SCHEMA v2 (r8): widened from (attr, from_us, opener_id) by the
# last-folded (ts, event_id) for the order guard. applyInPandasWithState
# decodes persisted state with the CURRENT schema, so a v1 checkpoint
# cannot be resumed under v2 — upgrading requires a fresh checkpoint_dir
# (standard stateful-schema-evolution constraint; see
# streaming/packing.py for the same note on its state).
STATE_SCHEMA = (
    "attr string, from_us long, opener_id long, last_us long, last_eid long"
)

_FMT = "%Y-%m-%d %H:%M:%S"


def _us(ts_series: pd.Series) -> list[int]:
    """µs-since-epoch ints, robust to the Arrow conversion's unit/tz
    choices: strip any tz then convert explicitly to microsecond unit —
    no dtype-string sniffing (a 'datetime64[ns, UTC]' or non-ns unit would
    defeat a substring check)."""
    s = ts_series
    if getattr(s.dtype, "tz", None) is not None:
        s = s.dt.tz_localize(None)
    return s.astype("datetime64[us]").astype("int64").tolist()


def scd2_stream(events: DataFrame) -> DataFrame:
    """events (streaming; user_id long, event_id long, ts timestamp,
    attr string) → CLOSED SCD2 versions as they close."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            attr0, from_us, opener, last_us, last_eid = state.get
            cur = [attr0, from_us, opener]  # the open version
        else:
            cur, last_us, last_eid = None, None, None
        closed: list[tuple[int, str, str, str]] = []
        late: list[tuple[int, str, str]] = []  # (event_id, ts_str, attr)
        batch = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for t_us, eid, attr in zip(
            _us(batch["ts"]), batch["event_id"].tolist(), batch["attr"].tolist()
        ):
            if last_us is not None and (t_us, eid) <= (last_us, last_eid):
                # behind the fold: quarantine, never mis-fold
                late.append(
                    (eid, pd.Timestamp(t_us, unit="us").strftime(_FMT), attr)
                )
                continue
            if cur is None:
                cur = [attr, t_us, eid]
            elif attr != cur[0]:
                closed.append(
                    (
                        cur[2],
                        pd.Timestamp(cur[1], unit="us").strftime(_FMT),
                        pd.Timestamp(t_us, unit="us").strftime(_FMT),
                        cur[0],
                    )
                )
                cur = [attr, t_us, eid]
            # same attr: the open version absorbs the event (run collapse)
            last_us, last_eid = t_us, eid
        if cur is not None:
            state.update((cur[0], cur[1], cur[2], last_us, last_eid))
        if closed or late:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * (len(closed) + len(late)),
                    "event_id": [c[0] for c in closed] + [e[0] for e in late],
                    "valid_from": [c[1] for c in closed] + [e[1] for e in late],
                    "valid_to": [c[2] for c in closed] + [None] * len(late),
                    "attr": [c[3] for c in closed] + [e[2] for e in late],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_current_snapshot(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The dimension's CURRENT rows, read from the stream's own state
    store (the statestore batch data source over the checkpoint) in
    q106's exact output shape — so ``scd2_stream`` output ∪ this snapshot
    equals the batch builder's full answer.

    Formatting runs through the SAME pandas path as the fold's closed
    rows (mapInPandas, Arrow-batched — distributed, no collect), which
    makes the strings identical by construction instead of relying on
    date_format's session-timezone rendering of wall-clock µs."""
    st = spark.read.format("statestore").load(checkpoint_dir)
    narrow = st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.opener_id").alias("event_id"),
        F.col("value.groupState.from_us").alias("from_us"),
        F.col("value.groupState.attr").alias("attr"),
    )

    def _fmt(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "valid_from": pd.to_datetime(
                        pdf["from_us"], unit="us"
                    ).dt.strftime(_FMT),
                    "valid_to": ["CURRENT"] * len(pdf),
                    "attr": pdf["attr"],
                }
            )

    return narrow.mapInPandas(_fmt, schema=OUTPUT_SCHEMA)
