"""Streamed KS drift == q230's batch statistic over the same rows,
across micro-batch boundaries and a full-replay redelivery."""

import json

from pyspark.sql import functions as F

from csv_loader_spark.queries.analytics5 import q230_ks_drift
from csv_loader_spark.streaming.ks_drift import start_ks_drift

SCHEMA = "doc_id long, source string, n_chars long"


def _write(path, rows):
    with open(path, "w") as f:
        for doc_id, source, n_chars in rows:
            f.write(
                json.dumps(
                    {"doc_id": doc_id, "source": source, "n_chars": n_chars}
                )
                + "\n"
            )


def _run(spark, src, store, out, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_ks_drift(stream, store, out, ckpt, available_now=True)
    q.awaitTermination(180)


def test_ks_drift_stream_equals_batch_and_replays(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    store = str(tmp_path / "store")
    out = str(tmp_path / "ks")
    # b2 SHIFTS source a's length distribution and adds a new source c —
    # the merged histogram must fold both batches before the KS compare,
    # and source b's rows arrive only in b1 (its histogram partition is
    # untouched by b2 yet still in the final answer)
    b1 = [
        (1, "a", 10), (2, "a", 10), (3, "a", 20),
        (4, "b", 10), (5, "b", 30),
    ]
    b2 = [
        (6, "a", 40), (7, "a", 40),
        (8, "c", 20), (9, "c", 30), (10, "c", 30),
    ]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)
    _run(spark, src, store, out, str(tmp_path / "ckpt1"))

    # batch reference: q230 over the same rows written as a documents table
    batch_dir = tmp_path / "tbl"
    batch_dir.mkdir()
    spark.createDataFrame(b1 + b2, SCHEMA).write.parquet(
        str(batch_dir / "documents.parquet")
    )
    expect = {
        r["source"]: (r["n_docs"], r["ks"])
        for r in q230_ks_drift(spark, str(batch_dir)).collect()
    }
    got = {
        r["source"]: (r["n_docs"], r["ks"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == expect
    assert set(got) == {"a", "b", "c"}

    # the histogram store is the mergeable sufficient statistic
    hist = {
        (r["source"], r["v"]): r["c"]
        for r in spark.read.parquet(store).collect()
    }
    assert hist[("a", 10)] == 2 and hist[("a", 40)] == 2
    assert hist[("c", 30)] == 2

    # redelivery: a fresh checkpoint re-delivers batch ids 0 and 1 over
    # the same files; the ledger must skip both, leaving store + answer
    # byte-identical (no double-counted histogram)
    _run(spark, src, store, out, str(tmp_path / "ckpt2"))
    assert {
        (r["source"], r["v"]): r["c"]
        for r in spark.read.parquet(store).collect()
    } == hist
    assert {
        r["source"]: (r["n_docs"], r["ks"])
        for r in spark.read.parquet(out).collect()
    } == expect


def test_ks_drift_single_source_degenerate(spark, tmp_path):
    """One source: rest-of-corpus is empty, na*(n-na) = 0 — the shared
    algebra divides by zero into NULL (Spark semantics); the monitor
    must still emit the row with n_docs correct rather than crash."""
    src = tmp_path / "docs"
    src.mkdir()
    _write(src / "b1.json", [(1, "only", 10), (2, "only", 20)])
    store = str(tmp_path / "store")
    out = str(tmp_path / "ks")
    _run(spark, src, store, out, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    assert rows[0]["source"] == "only"
    assert rows[0]["n_docs"] == 2
    assert rows[0]["ks"] is None
