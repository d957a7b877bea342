"""Incremental corpus ingestion with dedup against the existing corpus.

A 100 TB pipeline never re-runs global dedup when new documents arrive; it
maintains a fingerprint INDEX of the accepted corpus and checks each
arriving micro-batch against it:

    new docs ->(fingerprint)-> anti-join vs static index -> in-stream dedup

- The index probe is a STREAM-STATIC left-anti join: stateless on the
  streaming side (Spark re-plans the static side per micro-batch, so a
  refreshed index parquet is picked up between batches), and the index
  frame carries only the fingerprint column — at 10^10 docs that is a
  hash-partitioned id table, not the corpus.
- Within-stream duplicates (the same novel doc arriving twice before the
  index is refreshed) are dropped by fingerprint with
  dropDuplicatesWithinWatermark when an event-time column is available —
  bounded state, the same trade as streaming/pings.py's metrics — or
  exact dropDuplicates as the documented unbounded opt-in for ts-less
  streams.

The transformation is mode-agnostic (plain DataFrame ops), so the SAME
function serves the oracle-gated batch twin (q104, queries/llm5.py) and
the streaming path; tests/test_stream_static_dedup.py asserts the
streaming run lands exactly the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT


def fingerprint_index(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The dedup index of an accepted corpus: the DISTINCT normalized
    content fingerprints, one narrow column (q28's hash — md5 over the
    normalized token stream)."""
    return corpus.select(TXT.fingerprint(text_col).alias("fp")).distinct()


def novel_documents(
    arrivals: DataFrame,
    index: DataFrame,
    *,
    ts_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Documents from ``arrivals`` whose content is new — absent from the
    ``index`` AND not a duplicate of an earlier arrival. Keeps every input
    column plus ``fp``.

    Batch: the in-stream dedup keeps the min doc_id per fingerprint
    (deterministic). Streaming: first-arrival-wins per fingerprint, with
    watermark-bounded state when ``ts_col`` is given (late duplicates
    beyond ``delay`` may re-admit a fingerprint — the documented bounded-
    state trade); without ``ts_col`` the state is exact and unbounded."""
    tagged = arrivals.withColumn("fp", TXT.fingerprint("text"))
    novel = tagged.join(index, "fp", "left_anti")
    if novel.isStreaming:
        if ts_col is not None:
            return novel.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
                ["fp"]
            )
        return novel.dropDuplicates(["fp"])
    # batch: deterministic survivor (min doc_id), not hash-partition luck
    return (
        novel.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
