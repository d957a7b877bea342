"""Streaming heavy hitters: the q169 Misra-Gries candidate pass run
continuously over an arriving token stream via applyInPandasWithState.

Sharding strengthens the batch guarantee: tokens are hash-partitioned by
token (``pmod(xxhash64(w), shards)``), so EVERY occurrence of a token
lands in the same shard's k-counter summary. The MG invariant per shard
(any item with shard-count > n_shard/k survives the summary, and every
surviving counter is an underestimate by at most n_shard/k — Misra &
Gries 1982; Metwally et al. 2005) therefore applies to each token's
GLOBAL count: a token with global count > n_shard/k is guaranteed
present in its shard's state at every trigger after it crosses the
threshold. The batch twin (q169's per-partition summaries) only gets the
union-superset guarantee; the streaming shard layout also yields a
per-token lower bound ``c_lower`` with bounded error.

Emission contract: every micro-batch appends a full snapshot of each
UPDATED shard's candidate set, stamped with that shard's running token
count ``n_shard`` and the micro-batch ordinal ``snap`` (monotone per
shard) — consumers keep each shard's max-``snap`` rows. That contract is
EXECUTABLE, not prose: :func:`heavy_hitters_current` materializes the
max-``snap`` view over a landed sink, and :func:`heavy_hitters_recount`
runs the exact candidate recount against a landed corpus exactly as
q169's phase 2 does (broadcast-semi-join, threshold on both sides).
Coverage condition: with per-shard capacity ``k`` >= the recount's
support divisor ``k_support``, every token with global count
> N/k_support survives its shard summary (n_shard <= N, so the MG bound
n_shard/k <= N/k_support), making stream-consumer == batch-q169 exact.

Scale: state per shard is O(k) (two arrays + two longs); the token
stream shuffles once on the shard key; nothing else leaves the
executors. k and shards size the memory/error trade: error bound is
n_shard/k ≈ N/(shards·k) for a balanced hash.

Reference note: CsvLoader.java (274 lines) has no statistics surface;
this extends the beyond-reference streaming operator family
(SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, w string, c_lower long, n_shard long, snap long"
# STATE: the k-counter summary as parallel arrays + the shard's running
# token count + the snapshot ordinal. applyInPandasWithState decodes
# state with the CURRENT schema — checkpoints don't migrate across
# schema changes (the packing.py convention).
STATE_SCHEMA = "words array<string>, counts array<long>, n long, snap long"

_DEFAULT_K = 256


def mg_update(ctr: dict[str, int], w: str, k: int) -> None:
    """One Misra-Gries step: increment on hit, insert while below k
    counters, else decrement-all and evict zeros (amortized O(1))."""
    if w in ctr:
        ctr[w] += 1
    elif len(ctr) < k:
        ctr[w] = 1
    else:
        dead = [t for t, c in ctr.items() if c == 1]
        for t in ctr:
            ctr[t] -= 1
        for t in dead:
            del ctr[t]


def heavy_hitter_stream(
    tokens: DataFrame, k: int = _DEFAULT_K, shards: int = 8
) -> DataFrame:
    """tokens (streaming; column ``w`` string) → per-trigger snapshots of
    each updated shard's k-counter summary (see module docstring for the
    guarantee and the max-``snap`` consumption contract)."""
    # null tokens would hash to a permanent NULL shard group (xxhash64 of
    # NULL is NULL) that folds nothing yet updates state every trigger —
    # drop them before the shuffle
    sharded = tokens.filter(F.col("w").isNotNull()).withColumn(
        "shard", F.pmod(F.xxhash64("w"), F.lit(shards)).cast("int")
    )

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            words, counts, n, snap = state.get
            ctr = dict(zip(words, counts))
        else:
            ctr, n, snap = {}, 0, 0
        for pdf in pdfs:
            for w in pdf["w"]:
                if w is None:
                    continue
                n += 1
                mg_update(ctr, w, k)
        snap += 1
        state.update(
            (list(ctr.keys()), [int(c) for c in ctr.values()], int(n), int(snap))
        )
        yield pd.DataFrame(
            {
                "shard": pd.array([shard] * len(ctr), dtype="int32"),
                "w": list(ctr.keys()),
                "c_lower": pd.array(
                    [int(c) for c in ctr.values()], dtype="int64"
                ),
                "n_shard": pd.array([int(n)] * len(ctr), dtype="int64"),
                "snap": pd.array([int(snap)] * len(ctr), dtype="int64"),
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_current(spark, sink_path: str) -> DataFrame:
    """The consumption contract as code: read an append-mode sink of
    :func:`heavy_hitter_stream` snapshots and keep each shard's
    max-``snap`` rows — the CURRENT per-shard summary (shard, w,
    c_lower, n_shard, snap).

    Scale: the sink holds O(triggers * shards * k) tiny rows; the window
    max partitions on ``shard`` (bounded cardinality), nothing touches
    the corpus."""
    from pyspark.sql import Window

    snaps = spark.read.parquet(sink_path)
    top = F.max("snap").over(Window.partitionBy("shard"))
    return (
        snaps.withColumn("_top", top)
        .filter(F.col("snap") == F.col("_top"))
        .drop("_top")
    )


def heavy_hitters_recount(
    spark,
    sink_path: str,
    tokens: DataFrame,
    k_support: int = 4096,
    topk: int | None = 25,
) -> DataFrame:
    """Exact heavy hitters from a landed stream sink + the landed corpus
    — q169's phase 2 (llm13.py) packaged for the streaming store:
    broadcast-semi-join the current candidate set against ``tokens``
    (batch column ``w``), recount exactly, keep support
    ``c * k_support > N`` and rank (c desc, w). Defaults mirror q169's
    HH_K=4096 / top-25.

    Exactness: the stream must have run with shard capacity
    ``k >= k_support`` (module docstring) — then the candidate set is a
    superset of every token that can pass the threshold, so the recount
    is unconditionally exact, identical to the batch answer on the same
    corpus. Scale: candidates are O(shards*k) rows (broadcast); the
    corpus is scanned once for the join + once for N, both map-side."""
    from pyspark.sql import Window

    cand = heavy_hitters_current(spark, sink_path).select("w").distinct()
    toks = tokens.filter(F.col("w").isNotNull())
    counts = (
        toks.join(F.broadcast(cand), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    hh = counts.crossJoin(F.broadcast(total)).filter(
        F.col("c") * F.lit(k_support) > F.col("n")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("w"))
    out = hh.withColumn("n_rank", F.row_number().over(w).cast("int"))
    if topk is not None:
        out = out.filter(F.col("n_rank") <= topk)
    return out.select("w", "c", "n_rank")
