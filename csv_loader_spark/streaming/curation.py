"""The CLOSED-LOOP admission pipeline: blocklist → near-dup probe →
hash-consistent per-source quota, composed per micro-batch over a growing
on-disk store — the streaming capstone of the admission DAG the batch
side proves with q127/q132.

Store layout (every write targets the batch's own partition with
overwrite; the fingerprint ledger records last — the ingest_dedup.py
crash-window discipline throughout):

    store/fp_index/batch=<id>    exact content fingerprints (+ ledger)
    store/band_index/batch=<id>  MinHash band signatures
    store/accepted/batch=<id>    docs that passed blocklist + dedup
    store/quota/batch=<id>       the FULL post-batch standing admitted
                                 set (source, doc_id, h) — bounded by
                                 |sources| * cap rows, the snapshot-chain
                                 state of the hash quota
    store/manifest/batch=<id>    per-arrival verdict rows + evictions

Semantics decisions (documented, deliberate):
- The dedup indexes track every doc that passed blocklist+dedup, even if
  the quota later rejects it: dedup is about content novelty (a re-crawl
  of a quota-rejected page is still a duplicate), the quota governs
  SELECTION among novel docs — the same separation real crawl pipelines
  keep between dedup-against-everything and sampling.
- The quota is the HASH-consistent rule (streaming/quota.py
  quota_stream_hash): because the hash order is corpus-stable, the
  standing admitted set after any replay equals the batch q121 rule over
  every dedup-accepted doc so far — batching commutes with selection —
  at the price of explicit ``quota_evicted`` revision rows when a later
  arrival displaces an earlier admission (append-style stores cannot
  retract; readers fold the manifest or just read the latest snapshot).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from csv_loader_spark.streaming.continuous_agg import (
    _already_applied,
    _record_applied,
)
from csv_loader_spark.streaming.ingest_dedup import (
    band_member_index,
    band_signature_index,
    compact_index,
    compact_member_index,
    guard_accepted_overwrite,
    ingest_verdicts,
    ingest_verdicts_verified,
    list_batch_partitions,
    read_band_index,
    read_band_member_index,
    read_index,
)

_QUOTA_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("h", T.IntegerType(), True),
    ]
)


def _quota_hash_col() -> F.Column:
    """The batch q121 order key (llm7's _hash16_spark_sql over doc_id),
    computed engine-side so the snapshot never round-trips to Python."""
    from csv_loader_spark.queries.llm2 import _hash16_spark_sql
    from csv_loader_spark.queries.llm7 import _QUOTA_SALT

    return F.expr(
        _hash16_spark_sql(f"concat(CAST(doc_id AS STRING), '{_QUOTA_SALT}')")
    )


def read_quota_snapshot(
    spark: SparkSession, store: str, *, exclude_batch: int | None = None
) -> DataFrame:
    """The standing admitted set = the newest committed full snapshot
    (ingest_dedup.read_newest_snapshot — the shared chain read rule;
    ``exclude_batch`` skips the in-flight batch's own partition so a
    crash-after-write redelivery re-reads its true predecessor)."""
    from csv_loader_spark.streaming.ingest_dedup import read_newest_snapshot

    return read_newest_snapshot(
        spark,
        os.path.join(store, "quota"),
        ["source", "doc_id", "h"],
        _QUOTA_SNAPSHOT_SCHEMA,
        exclude_batch=exclude_batch,
    )


def _prune_quota_snapshots(spark: SparkSession, store: str) -> int:
    """Keep only the newest quota snapshot (full-snapshot chain rule —
    ingest_dedup.prune_snapshot_chain), run on the compaction cadence."""
    from csv_loader_spark.streaming.ingest_dedup import prune_snapshot_chain

    return prune_snapshot_chain(spark, os.path.join(store, "quota"))


def start_curation_pipeline(
    arrivals: DataFrame,
    store: str,
    checkpoint_dir: str,
    *,
    cap: int = 30,
    compact_every: int | None = None,
    verify_members: bool = False,
    available_now: bool = False,
) -> StreamingQuery:
    """Per micro-batch: (1) drop blocklisted domains (map-side, q102's
    rule), (2) probe the fingerprint + band indexes and keep only
    ``accepted`` arrivals (ingest_verdicts — exact and near dedup against
    everything previously accepted AND within the batch), append their
    fingerprints/bands back, (3) re-rank the standing admitted set with
    the batch's newcomers by the corpus-stable hash order and keep the
    top ``cap`` per source, writing the full new snapshot and explicit
    eviction rows. Every arrival lands in the manifest with its verdict:
    blocked / exact_* / near_* / admitted / quota_rejected, plus
    quota_evicted revisions for displaced prior admissions.

    ``compact_every=K`` folds the committed fp/band index partitions into
    their seeds and prunes superseded quota snapshots after every K-th
    batch (the in-loop small-file janitor — see
    ingest_dedup.start_ingest_pipeline); accepted/manifest partitions are
    the pipeline's OUTPUT history and are never folded.
    ``verify_members=True`` (r10) runs the dedup stage on the VERIFY
    tier: the band store holds member rows, near_corpus rejections are
    exact-Jaccard-confirmed (precision 1.0), and compaction re-caps the
    buckets."""
    from csv_loader_spark.ops.curate import split_blocklisted
    from csv_loader_spark.queries.llm5 import _BLOCKLIST

    fp_path = os.path.join(store, "fp_index")
    band_path = os.path.join(store, "band_index")

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if _already_applied(fp_path, batch_id):
            return
        # stage 1: blocklist (q102's rule, shared with batch curate)
        blocked, survivors = split_blocklisted(batch_df, _BLOCKLIST)

        # stage 2: dedup probe against the grown indexes (membership by
        # default; verify_members swaps in the precision-1.0 tier and its
        # member store — ingest_dedup.py's two probe modes, same verdicts)
        fp_idx = read_index(spark, fp_path, exclude_batch=batch_id)
        if verify_members:
            verdicts = ingest_verdicts_verified(
                survivors,
                fp_idx,
                read_band_member_index(spark, band_path, exclude_batch=batch_id),
            )
        else:
            verdicts = ingest_verdicts(
                survivors,
                fp_idx,
                read_band_index(spark, band_path, exclude_batch=batch_id),
            )
        verdicts = verdicts.localCheckpoint(eager=True)
        accepted = verdicts.filter(F.col("verdict") == "accepted").drop("verdict")
        # ledger-stripped-redelivery guard (ingest_dedup.py): never
        # overwrite a previously-landed partition with an empty frame
        guard_accepted_overwrite(
            spark,
            os.path.join(store, "accepted"),
            batch_id,
            accepted.isEmpty(),
        )
        accepted.drop("fp").write.mode("overwrite").parquet(
            os.path.join(store, "accepted", f"batch={batch_id}")
        )
        grown = (
            band_member_index(accepted)
            if verify_members
            else band_signature_index(accepted)
        )
        grown.write.mode("overwrite").parquet(
            os.path.join(band_path, f"batch={batch_id}")
        )

        # stage 3: hash-consistent quota over the landed prefix
        prev = read_quota_snapshot(spark, store, exclude_batch=batch_id)
        newcomers = accepted.select(
            "source", "doc_id", _quota_hash_col().alias("h")
        ).join(prev.select("doc_id"), "doc_id", "left_anti")
        merged = prev.unionByName(newcomers.select("source", "doc_id", "h"))
        w = Window.partitionBy("source").orderBy("h", "doc_id")
        snapshot = (
            merged.withColumn("_rnk", F.row_number().over(w))
            .filter(F.col("_rnk") <= cap)
            .drop("_rnk")
            .localCheckpoint(eager=True)
        )
        snapshot.write.mode("overwrite").parquet(
            os.path.join(store, "quota", f"batch={batch_id}")
        )
        evicted = prev.join(snapshot.select("doc_id"), "doc_id", "left_anti")

        # manifest: one verdict row per arrival + eviction revisions
        admitted_ids = snapshot.select("doc_id")
        manifest = (
            blocked.select("doc_id", "source", F.lit("blocked").alias("verdict"))
            .unionAll(
                verdicts.filter(F.col("verdict") != "accepted").select(
                    "doc_id", "source", "verdict"
                )
            )
            .unionAll(
                accepted.join(admitted_ids, "doc_id", "left_semi").select(
                    "doc_id", "source", F.lit("admitted").alias("verdict")
                )
            )
            .unionAll(
                accepted.join(admitted_ids, "doc_id", "left_anti").select(
                    "doc_id", "source", F.lit("quota_rejected").alias("verdict")
                )
            )
            .unionAll(
                evicted.select(
                    "doc_id", "source", F.lit("quota_evicted").alias("verdict")
                )
            )
        )
        manifest.write.mode("overwrite").parquet(
            os.path.join(store, "manifest", f"batch={batch_id}")
        )

        # index append + ledger LAST (ingest_dedup's crash discipline):
        # the fp partition is the commit marker the fast-skip keys on
        accepted.select("fp").distinct().write.mode("overwrite").parquet(
            os.path.join(fp_path, f"batch={batch_id}")
        )
        _record_applied(fp_path, batch_id)

        # small-file janitor on a cadence (r10): fold the committed fp and
        # band partitions into their seeds and drop superseded quota
        # snapshots. Runs AFTER the ledger record, so only committed
        # batches ever fold; probe results are unchanged (asserted
        # mid-stream by tests/test_curation_loop.py).
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            compact_index(spark, fp_path)
            if verify_members:
                compact_member_index(spark, band_path, ledger_path=fp_path)
            else:
                compact_index(spark, band_path, ledger_path=fp_path)
            _prune_quota_snapshots(spark, store)

    writer = (
        arrivals.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
