"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (the extension point the reference lacks entirely —
its only state is two in-memory HashSets, CsvLoader.java:105-106).

Semantics: per user, consecutive events closer than ``gap`` belong to one
session; a session CLOSES when (a) a later event for the same user arrives
past the gap (emitted immediately), or (b) the event-time watermark passes
``last_event + gap`` (GroupStateTimeout.EventTimeTimeout — emitted even if
the user never returns). Exactly the semantics of the batch q23 sessionizer,
incrementalized.

Scale: state is one fixed-size tuple per ACTIVE user (not per event);
watermark timeouts garbage-collect idle users, so state size tracks
concurrent activity, not history. Arrow-batched per group — no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# state: (start_us, end_us, n_events, sum_value) — epoch µs keep arithmetic
# integral inside the state store
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint, s double"

_US = 1_000_000


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events (streaming, watermarked ``ts``) → closed sessions.

    Input needs columns: user_id (bigint), ts (timestamp), value (double).
    """
    gap_us = gap_minutes * 60 * _US

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is over
            start_us, end_us, n, s = state.get
            closed.append((start_us, end_us, n, s))
            state.remove()
        else:
            batch = pd.concat(list(pdfs)).sort_values("ts")
            ts_us = (batch["ts"].astype("int64")).tolist()  # datetime64[ns|us] → ns?
            # pandas stores datetime64 in ns in older versions, us in 2.x
            # for arrow-backed frames; normalize via the dtype's unit
            unit = str(batch["ts"].dtype)
            if "[ns]" in unit:
                ts_us = [t // 1000 for t in ts_us]
            values = batch["value"].tolist()

            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for t, v in zip(ts_us, values):
                if cur is None:
                    cur = [t, t, 1, float(v)]
                elif t - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [t, t, 1, float(v)]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += float(v)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # ms

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
