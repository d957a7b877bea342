"""Streaming per-source admission quota: the domain-cap curation rule
(q121) enforced at INGEST time, before anything lands.

q121 caps each source at N documents chosen by portable hash order over
a finished corpus; a live pipeline cannot wait for the corpus to finish
— it must decide per arriving document. This operator admits the first
N documents per source in arrival order (within a micro-batch: doc_id
order, deterministic under replay) and marks everything after the cap
rejected, with the running admission count on every row so the cap's
pressure is queryable.

Scale: state is TWO longs per source — the admission counter plus the
last_doc order guard (bounded by |sources|, no timeout); each group
processes an Arrow batch of (doc_id) rows — no document payload enters
Python (join the admission verdict back to the payload by doc_id
downstream, the q101 narrow-frame convention).

Ordering contract (packing.py's landing-zone convention, stated here
because the cross-batch guard depends on it): ACROSS micro-batches the
source must deliver doc_ids monotonically (true for a landing zone
naming files in doc order). A doc at-or-behind the carried last_doc is
indistinguishable from a redelivery and surfaces as a ``stale = true``
marker row that never consumes the cap — so a genuinely out-of-order
novel doc is NOT admitted by this mode; a pipeline whose arrivals are
unordered uses ``quota_stream_hash``, whose hash-rank re-ranking is
arrival-order-independent by construction.

Semantics note (documented divergence from the batch twin): the batch
rule samples by hash (corpus-stable), the streaming rule by arrival
order (prefix-stable) — the two agree on the COUNT admitted per source,
not necessarily the identity of the admitted docs. A pipeline that
needs hash-identical selection uses ``quota_stream_hash`` below (r9):
the same state operator re-ranking by the batch rule's hash order,
with explicit eviction rows when a later arrival displaces an earlier
admission.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, doc_id long, admitted boolean, n_admitted long, stale boolean"
)
# STATE SCHEMA v2 (r9 review): widened from the bare counter by last_doc —
# packing.py's cross-batch order guard, so a doubled landing-zone FILE
# (same doc_ids in a later micro-batch) cannot re-consume the cap. Same
# stateful-schema-evolution constraint as packing.py: a v1 checkpoint
# cannot resume under v2 (fresh checkpoint_dir required).
STATE_SCHEMA = "n_admitted long, last_doc long"

_DEFAULT_CAP = 30  # mirrors q121's _QUOTA
_NO_DOC = -(1 << 62)  # "no doc seen yet" sentinel, below any real id


def quota_stream(docs: DataFrame, cap: int = _DEFAULT_CAP) -> DataFrame:
    """docs (streaming; source string, doc_id long) → one row per doc
    with ``admitted`` (first ``cap`` per source across the whole stream),
    the post-decision running count ``n_admitted``, and ``stale``
    (true = a cross-batch redelivery / order-violation marker row whose
    ``admitted``/``n_admitted`` are NOT admission decisions — consumers
    filter ``stale`` before folding verdicts; see the module's ordering
    contract)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            n, last_doc = state.get
        else:
            n, last_doc = 0, _NO_DOC
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        # within-batch duplicate guard (r9, packing.py's hardening applied
        # here): a doubled landing-zone file delivers the same doc_id
        # twice and both copies would consume the cap, breaking the
        # documented count-parity with batch q121. Rows here are just
        # (source, doc_id), so the extra copies carry no information —
        # drop them rather than quarantine.
        batch = batch[~batch["doc_id"].duplicated(keep="first")]
        # CROSS-batch duplicate guard (r9 review): a doc at-or-behind the
        # carried last_doc is a redelivery (or an order violation) — it
        # surfaces as stale=True, never consumes the cap, and its verdict
        # row is a marker, not an admission decision.
        ids = batch["doc_id"].to_numpy()
        stale_mask = ids <= last_doc
        fresh = ids[~stale_mask]
        k = len(fresh)
        admit_n = max(0, min(cap - n, k))
        admitted = [True] * admit_n + [False] * (k - admit_n)
        running = [n + min(i + 1, admit_n) for i in range(k)]
        n += admit_n
        if k:
            last_doc = max(last_doc, int(fresh[-1]))
        state.update((int(n), int(last_doc)))
        out = pd.DataFrame(
            {
                "source": [source] * k,
                "doc_id": fresh,
                "admitted": pd.array(admitted, dtype="boolean"),
                "n_admitted": pd.array(running, dtype="int64"),
                "stale": pd.array([False] * k, dtype="boolean"),
            }
        )
        if stale_mask.any():
            st = ids[stale_mask]
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "source": [source] * len(st),
                            "doc_id": st,
                            "admitted": pd.array([False] * len(st), dtype="boolean"),
                            "n_admitted": pd.array([n] * len(st), dtype="int64"),
                            "stale": pd.array([True] * len(st), dtype="boolean"),
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


# ---------------------------------------------------------------------------
# r9: hash-consistent admission (the batch q121 rule over the landed prefix)
# ---------------------------------------------------------------------------

HASH_OUTPUT_SCHEMA = (
    "source string, doc_id long, admitted boolean, evicted boolean"
)
# STATE SCHEMA: the current admitted set as parallel (hash, doc_id) arrays —
# bounded by `cap` entries per source, the index a re-ranking admission
# needs and nothing more (payloads stay out of state, as everywhere).
HASH_STATE_SCHEMA = "hs array<long>, ids array<long>"


def _q121_hash(doc_id: int) -> int:
    """The batch rule's portable 16-bit order key: first 4 hex digits of
    md5(CAST(doc_id AS STRING) || ':quota') — bit-identical to
    queries/llm7.py q121's _hash16_spark_sql expression (and the DuckDB
    oracle's instr arithmetic), so streaming and batch rank identically."""
    import hashlib

    from csv_loader_spark.queries.llm7 import _QUOTA_SALT

    return int(
        hashlib.md5(f"{doc_id}{_QUOTA_SALT}".encode()).hexdigest()[:4], 16
    )


def quota_stream_hash(docs: DataFrame, cap: int = _DEFAULT_CAP) -> DataFrame:
    """Hash-CONSISTENT streaming quota: admit per source exactly the docs
    batch q121 would admit over the prefix landed so far — the documented
    alternative to ``quota_stream``'s arrival-order rule, for pipelines
    that need hash-identical selection (quota.py's original divergence
    note, promoted into code in r9).

    Each micro-batch re-ranks the union of the currently-admitted set and
    the batch's newcomers by (hash16(doc_id || ':quota'), doc_id) and
    keeps the top ``cap``. Because the hash order is corpus-stable, a
    later arrival CAN displace an earlier admission — the displaced doc
    is emitted as an ``evicted = true`` revision row (append mode cannot
    retract, so revocation is an explicit event the consumer folds:
    a doc's standing verdict is its LAST row). After every batch,
    {rows with admitted and not later evicted} == batch q121 over the
    landed prefix, identity included — asserted by
    tests/test_streaming_quota.py against the batch rule's own Spark
    expression.

    Scale: state is at most ``cap`` (hash, id) pairs per source — the
    same bounded index the batch rule's WindowGroupLimit holds per
    group — and each batch does an O((cap + b) log(cap + b)) local sort
    per source; payloads never enter Python (q101's narrow-frame
    convention)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            hs, ids = state.get
            current = list(zip(hs, ids))
        else:
            current = []
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        batch = batch[~batch["doc_id"].duplicated(keep="first")]
        batch_ids = [int(x) for x in batch["doc_id"]]
        prev_ids = {i for _, i in current}
        merged = current + [
            (_q121_hash(i), i) for i in batch_ids if i not in prev_ids
        ]
        merged.sort()
        admitted = merged[:cap]
        adm_ids = {i for _, i in admitted}
        out_src, out_id, out_adm, out_ev = [], [], [], []
        for i in batch_ids:
            out_src.append(source)
            out_id.append(i)
            out_adm.append(i in adm_ids)
            out_ev.append(False)
        in_batch = set(batch_ids)
        for _, i in current:
            if i not in adm_ids and i not in in_batch:
                out_src.append(source)
                out_id.append(i)
                out_adm.append(False)
                out_ev.append(True)
        state.update(
            ([int(h) for h, _ in admitted], [int(i) for _, i in admitted])
        )
        yield pd.DataFrame(
            {
                "source": out_src,
                "doc_id": pd.array(out_id, dtype="int64"),
                "admitted": pd.array(out_adm, dtype="boolean"),
                "evicted": pd.array(out_ev, dtype="boolean"),
            }
        )

    return docs.groupBy("source").applyInPandasWithState(
        _fn,
        outputStructType=HASH_OUTPUT_SCHEMA,
        stateStructType=HASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
