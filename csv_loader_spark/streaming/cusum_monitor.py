"""Streaming CUSUM anomaly monitor: Page's sequential test (Page 1954,
the one-sided tabular CUSUM) run continuously per key via
applyInPandasWithState — the live counterpart of q187's retrospective
changepoint locator.

Recursion per observation x (both sides tracked):

    s_pos = max(0, s_pos + (x - mu0 - slack))     -- upward shifts
    s_neg = max(0, s_neg + (mu0 - x - slack))     -- downward shifts

with an alarm row whenever either statistic crosses the decision
threshold ``h`` (after which that side resets, the standard restart
convention). ``mu0`` is the in-control reference mean and ``slack`` the
allowance (k in the SPC literature, usually half the shift to detect in
sigma units).

Ordering contract (the packing.py/quota.py landing-zone convention):
within a micro-batch rows fold in ``seq`` order; across micro-batches
``seq`` must be monotone per key — an observation at-or-behind the
carried high-water mark is a redelivery and surfaces as ``stale = true``
(never folded twice, so a replayed batch cannot double-advance the
statistic or re-fire an alarm). A duplicate ``seq`` WITHIN one
micro-batch folds its lowest ``x`` (deterministic) and surfaces the
other copies as stale rows too.

Scale: state is four numbers per key; observations shuffle once on the
key. The fold is O(batch) python over Arrow batches — the same
per-group state shape as the quota/packing operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key string, seq long, x double, s_pos double, s_neg double, "
    "alarm boolean, stale boolean"
)
STATE_SCHEMA = "s_pos double, s_neg double, last_seq long"

_NO_SEQ = -(1 << 62)


def cusum_fold(
    xs: list[float], mu0: float, slack: float, h: float,
    s_pos: float = 0.0, s_neg: float = 0.0,
) -> list[tuple[float, float, bool]]:
    """The pure recursion (shared by the operator and its tests): returns
    one (s_pos, s_neg, alarm) per observation; an alarming side resets
    to 0 after firing (restart convention)."""
    out = []
    for x in xs:
        s_pos = max(0.0, s_pos + (x - mu0 - slack))
        s_neg = max(0.0, s_neg + (mu0 - x - slack))
        alarm = s_pos > h or s_neg > h
        out.append((s_pos, s_neg, alarm))
        if s_pos > h:
            s_pos = 0.0
        if s_neg > h:
            s_neg = 0.0
    return out


def cusum_stream(
    obs: DataFrame, mu0: float, slack: float, h: float
) -> DataFrame:
    """obs (streaming; key string, seq long, x double) → per-observation
    CUSUM statistics + alarm flags, folded in seq order with cross-batch
    state resume and redelivery quarantine (see module docstring)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            s_pos, s_neg, last_seq = state.get
        else:
            s_pos, s_neg, last_seq = 0.0, 0.0, _NO_SEQ
        # deterministic fold order: (seq, x) — a within-batch duplicate
        # seq (source retry inside one trigger) folds its LOWEST x and
        # surfaces the other copies as stale rows, same as the
        # cross-batch redelivery contract (they carry data, so silent
        # dropping would hide the retry from auditors and make which
        # copy folded arrival-order-dependent)
        batch = pd.concat(list(pdfs)).sort_values(["seq", "x"])
        dup_mask = batch["seq"].duplicated(keep="first").to_numpy()
        seqs = batch["seq"].to_numpy()
        stale_mask = (seqs <= last_seq) | dup_mask
        fresh = batch[~stale_mask]
        folded = cusum_fold(
            [float(v) for v in fresh["x"]], mu0, slack, h, s_pos, s_neg
        )
        if folded:
            # carry the POST-reset statistics: recompute the tail state
            s_pos, s_neg, alarm = folded[-1]
            if s_pos > h:
                s_pos = 0.0
            if s_neg > h:
                s_neg = 0.0
            last_seq = int(fresh["seq"].iloc[-1])
        state.update((float(s_pos), float(s_neg), int(last_seq)))
        n = len(fresh)
        out = pd.DataFrame(
            {
                "key": [k] * n,
                "seq": fresh["seq"].to_numpy(),
                "x": fresh["x"].to_numpy(),
                "s_pos": [f[0] for f in folded],
                "s_neg": [f[1] for f in folded],
                "alarm": pd.array([f[2] for f in folded], dtype="boolean"),
                "stale": pd.array([False] * n, dtype="boolean"),
            }
        )
        if stale_mask.any():
            st = batch[stale_mask]
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "key": [k] * len(st),
                            "seq": st["seq"].to_numpy(),
                            "x": st["x"].to_numpy(),
                            "s_pos": [float("nan")] * len(st),
                            "s_neg": [float("nan")] * len(st),
                            "alarm": pd.array([False] * len(st), dtype="boolean"),
                            "stale": pd.array([True] * len(st), dtype="boolean"),
                        }
                    ),
                ],
                ignore_index=True,
            )
        yield out

    return obs.groupBy("key").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
