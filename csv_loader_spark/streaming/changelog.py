"""Incremental release changelog: q135's snapshot diff as a CLOSED-LOOP
streaming operator (r10, the q104/q131 pattern applied once more).

q135 diffs two complete corpus snapshots with one full-outer fingerprint
join. A release pipeline rarely has two complete snapshots side by side —
it has a STREAM of document-version events (upserts and deletes from a
crawler or an upstream CDC feed) and wants, per micro-batch, the
added/changed/removed/unchanged roll-up against the corpus's standing
state, plus that state kept current for the next batch.

Store layout (ingest_dedup.py's crash-window discipline throughout):

    store/state/batch=<id>      the FULL post-batch standing state
                                (doc_id, source, fp, n_tok) — the
                                quota-snapshot chain pattern: each
                                snapshot is complete, readers take the
                                newest committed one (+ ledger)
    store/changelog/batch=<id>  the batch's (source, verdict, n_docs,
                                tok_delta) roll-up

The full-state-per-batch chain is the single-FS stand-in for a keyed
transactional table (Delta/Iceberg MERGE or a state-store backend would
hold the same (doc_id, fp, n_tok) rows); it is bounded by the corpus's
live document count with four narrow columns, and `_prune`-style cleanup
rides the same cadence story as curation.py's quota chain. The
TRANSFORMATION (``apply_version_events``) is mode-agnostic, so the exact
same function serves the oracle-gated batch twin (q147, queries/llm8.py)
and the foreachBatch loop — tests/test_changelog.py asserts the
streaming fold lands exactly the batch answer and replays idempotently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.streaming.continuous_agg import (
    _already_applied,
    _record_applied,
)
from csv_loader_spark.streaming.ingest_dedup import list_batch_partitions

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("fp", T.StringType(), True),
        T.StructField("n_tok", T.IntegerType(), True),
    ]
)


def snapshot_state(docs: DataFrame) -> DataFrame:
    """A corpus snapshot reduced to the changelog's state columns:
    (doc_id, source, fp, n_tok) — q135's fingerprint frame. Content
    never enters the state; the md5 fingerprint is the comparison key."""
    return docs.select(
        "doc_id",
        "source",
        TXT.fingerprint("text").alias("fp"),
        F.size(TXT.tokens("text")).alias("n_tok"),
    )


def apply_version_events(
    state: DataFrame, events: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Fold one batch of version events over the standing state.

    ``events``: (doc_id, source, op, text[, seq]) with op in
    ('upsert', 'delete'); when several events hit one doc_id in a batch,
    the highest ``seq`` (tie-broken deterministically by op then text)
    wins — the NET effect is what the changelog reports, so an add
    followed by an in-batch delete is a no-op, exactly as if the batch
    boundary had fallen differently (the commutes-with-batching property
    the stream==batch test asserts).

    Returns ``(changelog, new_state)``:

    - changelog: (source, verdict, n_docs, tok_delta) where verdict is
      'added' (upsert of an unknown doc_id), 'changed' (upsert with a
      different fingerprint), 'unchanged' (re-crawl of identical
      content), or 'removed' (delete of a known doc_id); a delete of an
      unknown doc_id is a no-op and reports nothing. tok_delta is the
      net token-count movement (+new, new-old, 0, -old respectively).
    - new_state: the standing state after the batch.

    Scale: one window per (batch-local) doc_id for last-event-wins, one
    LEFT equi-join of the batch's events against the state on doc_id,
    one anti-join + union for the state update — all id-table shapes;
    document text is fingerprinted once per event and never rides a
    shuffle. The state side is the big relation, so at 10^10 docs the
    join hashes the (small) event side per batch.
    """
    cols = ["doc_id", "source", "op", "text"]
    seq = F.col("seq") if "seq" in events.columns else F.lit(0)
    w = Window.partitionBy("doc_id").orderBy(
        seq.desc(), F.col("op"), F.col("text")
    )
    latest = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )
    ev = latest.select(
        "doc_id",
        F.col("source").alias("e_source"),
        "op",
        TXT.fingerprint("text").alias("e_fp"),
        F.size(TXT.tokens("text")).alias("e_n_tok"),
    )
    j = ev.join(
        state.select(
            "doc_id", F.col("fp").alias("s_fp"), F.col("n_tok").alias("s_n_tok")
        ),
        "doc_id",
        "left",
    )
    verdict = (
        F.when(
            (F.col("op") == "delete") & F.col("s_fp").isNotNull(), F.lit("removed")
        )
        .when(F.col("op") == "delete", F.lit(None))
        .when(F.col("s_fp").isNull(), F.lit("added"))
        .when(F.col("e_fp") != F.col("s_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    tok_delta = (
        F.when(F.col("op") == "delete", -F.col("s_n_tok"))
        .when(F.col("s_fp").isNull(), F.col("e_n_tok"))
        .otherwise(F.col("e_n_tok") - F.col("s_n_tok"))
    )
    tagged = j.select(
        "doc_id",
        F.col("e_source").alias("source"),
        "op",
        "e_fp",
        "e_n_tok",
        verdict.alias("verdict"),
        tok_delta.alias("tok_delta"),
    ).filter(F.col("verdict").isNotNull())
    changelog = tagged.groupBy("source", "verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok_delta").cast("long").alias("tok_delta"),
    )
    upserts = tagged.filter(F.col("op") == "upsert").select(
        "doc_id",
        "source",
        F.col("e_fp").alias("fp"),
        F.col("e_n_tok").alias("n_tok"),
    )
    new_state = state.join(
        latest.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(upserts)
    return changelog, new_state


def read_state_snapshot(
    spark: SparkSession, store: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The standing state = the newest committed full snapshot
    (ingest_dedup.read_newest_snapshot — the shared chain read rule)."""
    from csv_loader_spark.streaming.ingest_dedup import read_newest_snapshot

    return read_newest_snapshot(
        spark,
        os.path.join(store, "state"),
        ["doc_id", "source", "fp", "n_tok"],
        _STATE_SCHEMA,
        exclude_batch=exclude_batch,
    )


def seed_state(docs: DataFrame, store: str) -> None:
    """Bootstrap the state chain from an existing corpus snapshot
    (``batch=-1``, the seed convention)."""
    snapshot_state(docs).write.mode("overwrite").parquet(
        os.path.join(store, "state", "batch=-1")
    )


def _prune_state_snapshots(spark: SparkSession, store: str) -> int:
    """Keep only the newest state snapshot (full-snapshot chain rule —
    ingest_dedup.prune_snapshot_chain). The chain's essential janitor:
    each snapshot is corpus-sized, so an unpruned K-batch run stores K
    copies of the corpus."""
    from csv_loader_spark.streaming.ingest_dedup import prune_snapshot_chain

    return prune_snapshot_chain(spark, os.path.join(store, "state"))


def start_changelog_pipeline(
    events: DataFrame,
    store: str,
    checkpoint_dir: str,
    *,
    compact_every: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Per micro-batch: fold the batch's version events over the newest
    committed state snapshot, land the batch changelog under
    ``changelog/batch=<id>`` and the full new state under
    ``state/batch=<id>`` (both overwrite-idempotent), ledger last — the
    ingest_dedup crash discipline: a crash between the writes and the
    ledger record redelivers the batch, which re-reads its true
    predecessor (``exclude_batch``) and rewrites identical files.

    ``compact_every=K`` prunes superseded state snapshots after every
    K-th committed batch (the corpus-sized chain is the store that grows
    fastest without it); changelog partitions are the pipeline's OUTPUT
    history and are never pruned. Pruning runs after the ledger record,
    so the newest committed snapshot — the one a redelivery would need —
    always survives."""
    state_path = os.path.join(store, "state")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if _already_applied(state_path, batch_id):
            return
        prev = read_state_snapshot(spark, store, exclude_batch=batch_id)
        changelog, new_state = apply_version_events(prev, batch_df)
        new_state = new_state.localCheckpoint(eager=True)
        changelog.write.mode("overwrite").parquet(
            os.path.join(store, "changelog", f"batch={batch_id}")
        )
        new_state.write.mode("overwrite").parquet(
            os.path.join(state_path, f"batch={batch_id}")
        )
        _record_applied(state_path, batch_id)
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            _prune_state_snapshots(spark, store)

    writer = (
        events.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
