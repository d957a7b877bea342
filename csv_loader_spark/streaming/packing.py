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

Scale: state is three ints per source (bounded by |sources|, no timeout
needed); each group processes an Arrow batch of (doc_id, n_tok) pairs —
the text never enters Python, mirroring the batch twin. Ordering: within
one micro-batch docs are folded in doc_id order; ACROSS batches the
source must deliver batches in doc order (true for a file stream naming
files monotonically — the landing-zone convention). The operator can SEE
a violation (r8): state carries the last folded doc_id, and a doc
arriving at-or-behind it is NOT folded — it is emitted with
``pack_id = QUARANTINED`` (-1) so the landing-zone bug surfaces as
queryable rows instead of a silent mis-assignment
(tests/test_streaming_packing.py::test_out_of_order_batch_is_quarantined).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from csv_loader_spark.queries.llm5 import _PACK_CAP, pack_fold

OUTPUT_SCHEMA = "source string, doc_id long, n_tok long, pack_id long"
# STATE SCHEMA v2 (r8): widened from (pack_id, fill) by last_doc for the
# order guard. applyInPandasWithState decodes persisted state with the
# CURRENT schema, so a checkpoint written by the v1 schema cannot be
# resumed under v2 — upgrading requires a fresh checkpoint_dir (the
# standard stateful-schema-evolution constraint; Spark state stores have
# no migration hook for this operator family).
STATE_SCHEMA = "pack_id long, fill long, last_doc long"

# pack_id emitted for docs that arrived at-or-behind the last folded
# doc_id: folding them would silently corrupt the carry, so they are
# surfaced instead (real pack ids are always >= 0)
QUARANTINED = -1
_NO_DOC = -(1 << 62)  # "no doc folded yet" sentinel, below any real id


def pack_stream(docs: DataFrame, capacity: int = _PACK_CAP) -> DataFrame:
    """docs (streaming; source string, doc_id long, n_tok long) → per-doc
    pack assignments, first-fit per source, resumed across micro-batches.
    Docs violating cross-batch doc_id order land with
    ``pack_id = QUARANTINED`` instead of being mis-folded."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            cur, fill, last_doc = state.get
            started = True
        else:
            cur, fill, last_doc, started = 0, 0, _NO_DOC, False
        # sort by BOTH columns: pandas' default quicksort is unstable, so
        # under duplicated doc_ids carrying different n_tok the copy that
        # duplicated(keep="first") folds would be replay-nondeterministic;
        # the (doc_id, n_tok) key makes the folded copy (smallest n_tok)
        # deterministic under redelivery
        batch = pd.concat(list(pdfs)).sort_values(["doc_id", "n_tok"])
        # quarantine BOTH order violations: docs at-or-behind the carried
        # last_doc (cross-batch) and repeated doc_ids WITHIN the batch (a
        # doubled landing-zone file) — folding either would silently
        # corrupt the fill carry. duplicated(keep="first") folds the first
        # copy and surfaces the rest, matching the cross-batch behavior.
        late = (
            batch["doc_id"].to_numpy() <= last_doc
        ) | batch["doc_id"].duplicated(keep="first").to_numpy()
        ok = batch[~late]
        packs, cur, fill, started = pack_fold(
            ok["n_tok"], cur, fill, started, capacity
        )
        if len(ok):
            last_doc = max(last_doc, int(ok["doc_id"].iloc[-1]))
        state.update((int(cur), int(fill), int(last_doc)))
        out = pd.DataFrame(
            {
                "source": [source] * len(ok),
                "doc_id": ok["doc_id"].to_numpy(),
                "n_tok": ok["n_tok"].to_numpy(),
                "pack_id": pd.array(packs, dtype="int64"),
            }
        )
        if late.any():
            lf = batch[late]
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "source": [source] * len(lf),
                            "doc_id": lf["doc_id"].to_numpy(),
                            "n_tok": lf["n_tok"].to_numpy(),
                            "pack_id": pd.array(
                                [QUARANTINED] * len(lf), dtype="int64"
                            ),
                        }
                    ),
                ],
                ignore_index=True,
            )
        yield out

    return docs.groupBy("source").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
