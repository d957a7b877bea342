"""Streamed per-user gap statistics == q231's batch formula over the same
rows, across micro-batch boundaries and a redelivery."""

import json
import math

from csv_loader_spark.streaming.gap_stats import gap_stats_stream

SCHEMA = "user_id long, ts_us long, seq long"

US = 1_000_000


def _write(path, rows):
    with open(path, "w") as f:
        for uid, ts_us, seq in rows:
            f.write(
                json.dumps({"user_id": uid, "ts_us": ts_us, "seq": seq})
                + "\n"
            )


def _batch_stats(rows):
    by_user = {}
    for uid, ts, _ in sorted(rows):
        by_user.setdefault(uid, []).append(ts)
    out = {}
    for uid, tss in by_user.items():
        tss = sorted(tss)
        gaps = [b - a for a, b in zip(tss, tss[1:])]
        n, sg = len(gaps), sum(gaps)
        sgg = sum(g * g for g in gaps)
        cv = round(math.sqrt(n * sgg - sg * sg) / sg, 4) if sg else None
        out[uid] = (n, sg, cv)
    return out


def test_gap_stats_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    out = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")
    # user 1: gaps split ACROSS the batch boundary (state must carry
    # last_ts); user 2: one huge 25-day gap so Σg² needs the hi/lo split
    # (25d in µs squared ≈ 4.7e24 > 2^63); the b2 duplicate of user 1's
    # (ts, seq) is a redelivery and must not double-fold
    b1 = [
        (1, 0 * US, 0),
        (1, 10 * US, 1),
        (2, 0 * US, 2),
    ]
    b2 = [
        (1, 10 * US, 1),          # redelivery
        (1, 25 * US, 3),
        (2, 25 * 86400 * US, 4),  # 25-day gap
    ]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        gap_stats_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    # latest snapshot per user = the one with the largest n_gaps
    latest = {}
    for r in rows:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_gaps"] > cur["n_gaps"]:
            latest[r["user_id"]] = r
    expected = _batch_stats(b1 + [x for x in b2 if x != (1, 10 * US, 1)])
    for uid, (n, sg, cv) in expected.items():
        got = latest[uid]
        assert got["n_gaps"] == n
        assert got["sum_g_us"] == sg
        assert got["cv"] == cv
        assert got["mean_gap_ms"] == sg // (n * 1000)
    # the redelivered row surfaced as stale exactly once
    assert sum(r["stale_rows"] for r in rows if r["user_id"] == 1) == 1
