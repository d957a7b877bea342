"""Streaming greedy sequence packing: q101's first-fit fold continued
incrementally over arriving document batches via applyInPandasWithState.

A training-data pipeline packs shards as documents LAND, not in one batch
job over the finished corpus — so the packer must resume mid-pack: the
state per source is exactly the fold's carry, (current pack_id, fill),
two integers. Each micro-batch folds its (doc_id-ordered) documents from
that carry with the SAME pack_fold the batch query and the recursive-CTE
oracle run (queries/llm5.py), so a stream of batches lands the identical
pack assignment as one batch over the concatenation — asserted end-to-end
by tests/test_streaming_packing.py.

Scale: state is two ints per source (bounded by |sources|, no timeout
needed); each group processes an Arrow batch of (doc_id, n_tok) pairs —
the text never enters Python, mirroring the batch twin. Ordering: within
one micro-batch docs are folded in doc_id order; ACROSS batches the
source must deliver batches in doc order (true for a file stream naming
files monotonically — the landing-zone convention) or pack assignment is
arrival-order, which is the standard streaming-packer semantic anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from csv_loader_spark.queries.llm5 import _PACK_CAP, pack_fold

OUTPUT_SCHEMA = "source string, doc_id long, n_tok long, pack_id long"
STATE_SCHEMA = "pack_id long, fill long"


def pack_stream(docs: DataFrame, capacity: int = _PACK_CAP) -> DataFrame:
    """docs (streaming; source string, doc_id long, n_tok long) → per-doc
    pack assignments, first-fit per source, resumed across micro-batches."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            cur, fill = state.get
            started = True
        else:
            cur, fill, started = 0, 0, False
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        packs, cur, fill, started = pack_fold(
            batch["n_tok"], cur, fill, started, capacity
        )
        state.update((int(cur), int(fill)))
        out = pd.DataFrame(
            {
                "source": [source] * len(batch),
                "doc_id": batch["doc_id"].to_numpy(),
                "n_tok": batch["n_tok"].to_numpy(),
                "pack_id": pd.array(packs, dtype="int64"),
            }
        )
        yield out

    return docs.groupBy("source").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
