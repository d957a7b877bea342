"""Streaming curation capstone: the q83 pipeline shape (quality filters →
fingerprint → exact dedup) running under Structured Streaming with bounded
state, asserted against the batch computation on the same corpus.

Stage mapping batch → streaming:
- scalar quality features/filters: identical column expressions (stateless);
- exact dedup: batch survivor-election window → streaming
  dropDuplicatesWithinWatermark on the fingerprint (state GC'd by the
  watermark, so the pipeline runs forever on an unbounded corpus feed).
The surviving FINGERPRINT SET is deterministic (which duplicate survives
is arrival-order-dependent, the set is not) — that is what's compared."""

import os

from pyspark.sql import functions as F

from csv_loader_spark.functions import text as TXT
from csv_loader_spark.io.tables import load_table

# q83's filter thresholds, reused verbatim


def _curate(df):
    """Shared stage chain: quality features + filters + fingerprint."""
    return (
        df.select(
            "doc_id",
            "lang",
            "ts",
            TXT.fingerprint("text").alias("fp"),
            F.size(TXT.tokens("text")).alias("n_tokens"),
            (TXT.punct_count("text").cast("double") / F.length("text")).alias(
                "punct_ratio"
            ),
        )
        .filter(
            F.col("lang").isin("en", "fr")
            & F.col("n_tokens").between(20, 2000)
            & (F.col("punct_ratio") < 0.1)
        )
    )


def test_streaming_curation_matches_batch_fingerprint_set(spark, tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # synthesize an event time (documents carry none): base + doc_id seconds
    docs = docs.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_577_836_800) + F.col("doc_id")),  # 2020-01-01
    )

    src = tmp_path / "stream_src"
    docs.coalesce(2).write.parquet(str(src))

    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(str(src))
        .transform(_curate)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["fp"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = [r["fp"] for r in spark.table("curated_stream").collect()]

    expected = {
        r["fp"] for r in _curate(docs).select("fp").distinct().collect()
    }
    assert sorted(got) == sorted(set(got)), "a fingerprint was emitted twice"
    assert set(got) == expected
    # the corpus has planted near-identical docs; make sure the filters and
    # dedup actually discarded something (not a vacuous pass-through)
    n_input = docs.count()
    assert 0 < len(got) < n_input
