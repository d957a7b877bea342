"""Stream-static incremental-ingest dedup (streaming/ingest_dedup.py):
arriving document batches anti-join a STATIC fingerprint index (stateless
per-batch probe) then dedup within the stream — and the streaming run must
land exactly the batch twin's answer (q104's shape)."""

import json
import os

from pyspark.sql import functions as F

from csv_loader_spark.streaming.ingest_dedup import fingerprint_index, novel_documents

_SCHEMA = "doc_id long, ts timestamp, text string"


def _write_batch(path, rows):
    with open(path, "w") as f:
        for doc_id, ts, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")


def test_stream_static_ingest_matches_batch(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, f"existing corpus document number {i}") for i in range(5)],
        "doc_id long, text string",
    )
    index = fingerprint_index(corpus)

    src = tmp_path / "arrivals"
    src.mkdir()
    # batch 1: one corpus dup, two novel docs, one in-batch dup of a novel
    _write_batch(
        src / "b1.json",
        [
            (100, "2026-01-01 10:00:00", "existing corpus document number 2"),
            (101, "2026-01-01 10:00:01", "a genuinely new document alpha"),
            (102, "2026-01-01 10:00:02", "another new document beta"),
            (103, "2026-01-01 10:00:03", "a genuinely new document alpha"),
        ],
    )
    # batch 2: cross-batch dup of alpha, one more corpus dup, one novel
    _write_batch(
        src / "b2.json",
        [
            (200, "2026-01-01 10:01:00", "a genuinely new document alpha"),
            (201, "2026-01-01 10:01:01", "existing corpus document number 0"),
            (202, "2026-01-01 10:01:02", "a third new document gamma"),
        ],
    )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # two real micro-batches
        .json(str(src))
    )
    novel = novel_documents(stream, index, ts_col="ts")
    q = (
        novel.writeStream.format("memory")
        .queryName("novel_docs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["text"])
        for r in spark.sql("SELECT doc_id, text FROM novel_docs").collect()
    }
    # exactly one survivor per novel fingerprint, first arrival wins;
    # corpus dups (100, 201) and stream dups (103, 200) never land
    assert got == {
        (101, "a genuinely new document alpha"),
        (102, "another new document beta"),
        (202, "a third new document gamma"),
    }

    # the batch twin over the union of all arrivals agrees (min doc_id
    # survivor == first arrival here, by construction of the ids)
    arrivals = spark.read.schema(_SCHEMA).json(str(src))
    batch = novel_documents(arrivals.select("doc_id", "text"), index)
    assert {(r["doc_id"], r["text"]) for r in batch.select("doc_id", "text").collect()} == got


def test_index_probe_carries_only_fingerprints(spark):
    """The index side of the anti-join is one hashed column — at 1e10
    accepted docs the probe must be an id-table operation, never a corpus
    rescan with text aboard."""
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    index = fingerprint_index(corpus)
    assert index.columns == ["fp"]
    arrivals = spark.createDataFrame(
        [(100, "doc 3"), (101, "brand new")], "doc_id long, text string"
    )
    out = novel_documents(arrivals, index)
    assert [r["doc_id"] for r in out.collect()] == [101]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
