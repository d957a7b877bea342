"""Streaming Misra-Gries heavy hitters (streaming/heavy_hitters.py):
the per-shard guarantee holds across micro-batches (state resumes), the
snapshot contract is monotone, and counts are within the documented
error bound of truth."""

import collections
import json
import random

from csv_loader_spark.streaming.heavy_hitters import heavy_hitter_stream, mg_update

_SCHEMA = "w string"


def _write_batch(path, words):
    with open(path, "w") as f:
        for w in words:
            f.write(json.dumps({"w": w}) + "\n")


def _latest_snapshot(rows):
    """Apply the consumption contract: keep each shard's max-snap rows."""
    latest = {}
    for r in rows:
        latest.setdefault(r["shard"], []).append(r)
    out = {}
    for shard, rs in latest.items():
        top = max(r["snap"] for r in rs)
        for r in rs:
            if r["snap"] == top:
                out[r["w"]] = (r["c_lower"], r["n_shard"])
    return out


def test_stream_candidates_cover_heavy_tokens_across_batches(spark, tmp_path):
    rng = random.Random(11)
    words = (
        ["alpha"] * 300 + ["beta"] * 180 + [f"tail{i}" for i in range(400)]
    )
    rng.shuffle(words)
    src = tmp_path / "toks"
    src.mkdir()
    # split across 3 micro-batches so the guarantee must survive resumes
    third = len(words) // 3
    _write_batch(src / "b1.json", words[:third])
    _write_batch(src / "b2.json", words[third : 2 * third])
    _write_batch(src / "b3.json", words[2 * third :])
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    k = 16
    q = (
        heavy_hitter_stream(stream, k=k, shards=4)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM hh_out").collect()
    final = _latest_snapshot(rows)
    true_counts = collections.Counter(words)
    # per-token guarantee: global count > n_shard/k ==> present in final
    # state; count underestimates by at most n_shard/k
    for w, (c_lower, n_shard) in final.items():
        assert c_lower <= true_counts[w]
        assert true_counts[w] - c_lower <= n_shard / k
    shard_n = {}
    for r in rows:
        shard_n[r["shard"]] = max(shard_n.get(r["shard"], 0), r["n_shard"])
    assert sum(shard_n.values()) == len(words)
    for w in ("alpha", "beta"):
        # alpha/beta dominate any shard's n/k threshold — must be present
        assert w in final, w
        c_lower, n_shard = final[w]
        assert true_counts[w] > n_shard / k


def test_mg_update_matches_batch_reference():
    """The streaming fold's counter step is the same MG recurrence the
    batch q169 mapper implements — property-check on random data."""
    rng = random.Random(5)
    stream = [rng.choice(["a", "b", "c", "d", "e", "f", "g"]) for _ in range(500)]
    ctr: dict[str, int] = {}
    for w in stream:
        mg_update(ctr, w, 4)
    true = collections.Counter(stream)
    n = len(stream)
    for w, c in true.items():
        if c > n / 4:
            assert w in ctr
    for w, c in ctr.items():
        assert c <= true[w] and true[w] - c <= n / 4


def test_state_survives_checkpoint_restart(spark, tmp_path):
    """Two SEPARATE streaming runs sharing one checkpoint: the k-counter
    state persisted by run 1 must resume in run 2 — counts and n_shard
    keep growing across process restarts, and the final snapshot equals
    a single-run fold of the whole stream."""
    src = tmp_path / "toks"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    words1 = ["alpha"] * 40 + ["beta"] * 10
    words2 = ["alpha"] * 5 + ["gamma"] * 30
    _write_batch(src / "b1.json", words1)

    out_dir = str(tmp_path / "out")

    def _run(name):
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            heavy_hitter_stream(stream, k=8, shards=2)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out_dir).collect()

    rows1 = _run("hh_ckpt_a")
    final1 = _latest_snapshot(rows1)
    assert final1["alpha"][0] == 40  # full count, k=8 never evicts it

    _write_batch(src / "b2.json", words2)
    rows2 = _run("hh_ckpt_b")
    # run 2's output contains only batch-2's trigger, but its state
    # resumed from run 1: alpha's counter keeps the carried 40
    final2 = _latest_snapshot(rows1 + rows2)
    assert final2["alpha"][0] == 45
    assert final2["gamma"][0] == 30
    n_total = sum(
        max(r["n_shard"] for r in rows if r["shard"] == shard)
        for shard, rows in (
            (s, [r for r in rows1 + rows2 if r["shard"] == s])
            for s in {r["shard"] for r in rows1 + rows2}
        )
    )
    assert n_total == len(words1) + len(words2)


def test_consumer_api_recount_equals_batch_q169(spark, tmp_path):
    """The packaged consumer (heavy_hitters_current + heavy_hitters_recount)
    over a landed stream sink must reproduce the batch q169 answer exactly
    on the same corpus: stream shard capacity k >= k_support makes the
    candidate set a guaranteed superset, and the recount is exact."""
    from pyspark.sql import functions as F

    from csv_loader_spark.queries.llm13 import HH_K, HH_TOPK, q169_heavy_hitters
    from csv_loader_spark.streaming.heavy_hitters import (
        heavy_hitters_current,
        heavy_hitters_recount,
    )

    sf_dir = "/root/testdata/sf0.001"
    from csv_loader_spark.functions import text as TXT
    from csv_loader_spark.io.tables import load_table

    tokens = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(TXT.tokens("text")).alias("w"))
    )
    words = [r["w"] for r in tokens.collect()]
    src = tmp_path / "toks"
    src.mkdir()
    third = len(words) // 3
    for i, chunk in enumerate(
        (words[:third], words[third : 2 * third], words[2 * third :])
    ):
        _write_batch(src / f"b{i}.json", chunk)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sink = str(tmp_path / "sink")
    q = (
        heavy_hitter_stream(stream, k=HH_K, shards=4)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # current view honors the max-snap contract: one snapshot per shard
    cur = heavy_hitters_current(spark, sink)
    per_shard = {
        r["shard"]: r["snap"]
        for r in cur.select("shard", "snap").distinct().collect()
    }
    raw = spark.read.parquet(sink)
    for shard, snap in per_shard.items():
        top = raw.filter(F.col("shard") == shard).agg(F.max("snap")).collect()[0][0]
        assert snap == top

    got = heavy_hitters_recount(
        spark, sink, tokens, k_support=HH_K, topk=HH_TOPK
    ).collect()
    want = q169_heavy_hitters(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
