"""Streaming per-source admission quota (streaming/quota.py): the cap
binds ACROSS micro-batches from one integer of state, under-cap sources
admit everything, and the admitted count per source equals the batch
rule's (the documented divergence is selection identity, not count)."""

import json

from csv_loader_spark.streaming.quota import quota_stream

_SCHEMA = "source string, doc_id long"


def _write_batch(path, rows):
    with open(path, "w") as f:
        for source, doc_id in rows:
            f.write(json.dumps({"source": source, "doc_id": doc_id}) + "\n")


def test_quota_binds_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # cap=3: source a sends 2 then 3 (cap crossed mid-batch-2);
    # source b stays under cap
    _write_batch(src / "b1.json", [("a", 1), ("a", 2), ("b", 1)])
    _write_batch(src / "b2.json", [("a", 3), ("a", 4), ("a", 5), ("b", 2)])
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        quota_stream(stream, cap=3)
        .writeStream.format("memory")
        .queryName("quota_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM quota_out").collect()
    got = {(r["source"], r["doc_id"]): (r["admitted"], r["n_admitted"]) for r in rows}
    assert got == {
        ("a", 1): (True, 1),
        ("a", 2): (True, 2),
        ("a", 3): (True, 3),
        ("a", 4): (False, 3),
        ("a", 5): (False, 3),
        ("b", 1): (True, 1),
        ("b", 2): (True, 2),
    }
    # count parity with the batch rule: admitted per source == min(n, cap)
    admitted = {}
    for (s, _d), (a, _n) in got.items():
        admitted[s] = admitted.get(s, 0) + int(a)
    assert admitted == {"a": 3, "b": 2}


def test_duplicated_delivery_does_not_double_consume(spark, tmp_path):
    """r9 guard: a doubled landing-zone file delivers the same doc_id
    twice in one micro-batch — the duplicate must not consume the cap
    (count parity with batch q121, which sees each doc once)."""
    src = tmp_path / "docs"
    src.mkdir()
    # doc 1 delivered twice in b1; cap=2 must still admit doc 2 from b2
    _write_batch(src / "b1.json", [("a", 1), ("a", 1)])
    _write_batch(src / "b2.json", [("a", 2), ("a", 3)])
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        quota_stream(stream, cap=2)
        .writeStream.format("memory")
        .queryName("quota_dup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM quota_dup").collect()
    got = {(r["source"], r["doc_id"]): (r["admitted"], r["n_admitted"]) for r in rows}
    # one verdict per doc_id (the doubled copy is dropped, not re-emitted)
    assert got == {
        ("a", 1): (True, 1),
        ("a", 2): (True, 2),
        ("a", 3): (False, 2),
    }
