"""Streaming per-source admission quota: the domain-cap curation rule
(q121) enforced at INGEST time, before anything lands.

q121 caps each source at N documents chosen by portable hash order over
a finished corpus; a live pipeline cannot wait for the corpus to finish
— it must decide per arriving document. This operator admits the first
N documents per source in arrival order (within a micro-batch: doc_id
order, deterministic under replay) and marks everything after the cap
rejected, with the running admission count on every row so the cap's
pressure is queryable.

Scale: state is ONE integer per source (bounded by |sources|, no
timeout); each group processes an Arrow batch of (doc_id) rows — no
document payload enters Python (join the admission verdict back to the
payload by doc_id downstream, the q101 narrow-frame convention).

Semantics note (documented divergence from the batch twin): the batch
rule samples by hash (corpus-stable), the streaming rule by arrival
order (prefix-stable) — the two agree on the COUNT admitted per source,
not necessarily the identity of the admitted docs. A pipeline that needs
hash-identical selection runs q121 as a batch job over the landed
prefix instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "source string, doc_id long, admitted boolean, n_admitted long"
# STATE SCHEMA v1: the single running admission counter per source.
STATE_SCHEMA = "n_admitted long"

_DEFAULT_CAP = 30  # mirrors q121's _QUOTA


def quota_stream(docs: DataFrame, cap: int = _DEFAULT_CAP) -> DataFrame:
    """docs (streaming; source string, doc_id long) → one row per doc
    with ``admitted`` (first ``cap`` per source across the whole stream)
    and the post-decision running count ``n_admitted``."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        # within-batch duplicate guard (r9, packing.py's hardening applied
        # here): a doubled landing-zone file delivers the same doc_id
        # twice and both copies would consume the cap, breaking the
        # documented count-parity with batch q121. Rows here are just
        # (source, doc_id), so the extra copies carry no information —
        # drop them rather than quarantine.
        batch = batch[~batch["doc_id"].duplicated(keep="first")]
        k = len(batch)
        admit_n = max(0, min(cap - n, k))
        admitted = [True] * admit_n + [False] * (k - admit_n)
        running = [n + min(i + 1, admit_n) for i in range(k)]
        n += admit_n
        state.update((int(n),))
        yield pd.DataFrame(
            {
                "source": [source] * k,
                "doc_id": batch["doc_id"].to_numpy(),
                "admitted": pd.array(admitted, dtype="boolean"),
                "n_admitted": pd.array(running, dtype="int64"),
            }
        )

    return docs.groupBy("source").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
