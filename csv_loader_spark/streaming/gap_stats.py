"""Streaming inter-arrival regularity monitor — the live counterpart of
q231_bot_regularity: per-user gap sufficient statistics (n, Σg, Σg²)
maintained incrementally via applyInPandasWithState, with the CV emitted
per trigger.

The whole point of q231's sufficient-statistic formulation is that it
STREAMS: the state per user is four integers plus the last-seen
timestamp — no gap history. Σg² exceeds int64 (a 30-day µs gap squared
is ~6.7e24), and the state schema has no 128-bit type, so it is carried
as two longs (hi/lo in base 2^62) and recombined in exact Python ints
per batch — never a lossy double.

Ordering contract (the cusum_monitor convention): within a micro-batch
rows fold in (ts_us, seq) order; an observation at-or-behind the
carried (ts_us, seq) high-water mark is a redelivery — counted in
``stale_rows``, never folded twice, so replays cannot inflate the
statistics.

Output: one snapshot row per user per trigger — (user_id, n_gaps,
sum_g_us, mean_gap_ms, cv, stale_rows); the consumer keeps the latest
row per user. cv = sqrt(n·Σg² − (Σg)²)/Σg, identical to q231 (the
parity test asserts stream-final == batch over the same rows).

Scale: one shuffle on user_id per batch; state O(1) per user; the fold
is Arrow-batched Python (the quota/packing/cusum state shape).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_gaps long, sum_g_us long, mean_gap_ms long, "
    "cv double, stale_rows long"
)
STATE_SCHEMA = (
    "last_ts long, last_seq long, n_gaps long, sum_g long, "
    "sgg_hi long, sgg_lo long"
)

_NO_TS = -(1 << 62)
_BASE = 1 << 62


def gap_cv(n: int, sg: int, sgg: int) -> float | None:
    """cv = sqrt(n·Σg² − (Σg)²)/Σg from exact ints (q231's formula);
    None when undefined (no gaps or zero mean)."""
    if n <= 0 or sg <= 0:
        return None
    return math.sqrt(float(n * sgg - sg * sg)) / sg


def gap_stats_stream(events: DataFrame) -> DataFrame:
    """events (streaming; user_id long, ts_us long, seq long) →
    per-trigger per-user snapshot of the exact gap statistics."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            last_ts, last_seq, n_gaps, sum_g, hi, lo = state.get
        else:
            last_ts, last_seq, n_gaps, sum_g, hi, lo = (
                _NO_TS, _NO_TS, 0, 0, 0, 0,
            )
        sgg = int(hi) * _BASE + int(lo)
        batch = pd.concat(list(pdfs)).sort_values(["ts_us", "seq"])
        stale = 0
        for ts, seq in zip(batch["ts_us"].to_numpy(), batch["seq"].to_numpy()):
            ts, seq = int(ts), int(seq)
            if ts < last_ts or (ts == last_ts and seq <= last_seq):
                stale += 1
                continue
            if last_ts != _NO_TS:
                g = ts - last_ts
                n_gaps += 1
                sum_g += g
                sgg += g * g
            last_ts, last_seq = ts, seq
        state.update(
            (
                int(last_ts),
                int(last_seq),
                int(n_gaps),
                int(sum_g),
                int(sgg // _BASE),
                int(sgg % _BASE),
            )
        )
        cv = gap_cv(n_gaps, sum_g, sgg)
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "n_gaps": [n_gaps],
                "sum_g_us": [sum_g],
                "mean_gap_ms": [sum_g // (n_gaps * 1000) if n_gaps else 0],
                "cv": [round(cv, 4) if cv is not None else float("nan")],
                "stale_rows": [stale],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
