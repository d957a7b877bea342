"""applyInPandasWithState sessionization: gap-split emission + state carry
across micro-batches."""

import json

from pyspark.sql import functions as F

from csv_loader_spark.streaming.stateful import sessionize_stream

SCHEMA = "user_id bigint, ts timestamp, value double"


def _write_events(path, rows):
    with open(path, "w") as f:
        for uid, ts, v in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts, "value": v}) + "\n")


def test_sessionize_stream_gap_split_and_state_carry(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # batch 1: user 1 has two events 10 min apart (one open session);
    # user 2 has one event
    _write_events(
        src / "b1.json",
        [
            (1, "2020-01-01 10:00:00", 1.0),
            (1, "2020-01-01 10:10:00", 2.0),
            (2, "2020-01-01 10:05:00", 5.0),
        ],
    )
    # batch 2 (arrives later): user 1 returns 2h later → old session closes
    # and is EMITTED; user 2's event is within its session → stays open
    _write_events(
        src / "b2.json",
        [
            (1, "2020-01-01 12:10:00", 3.0),
            (2, "2020-01-01 10:20:00", 7.0),
        ],
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "0 seconds")
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sessions_out").collect()
    emitted = sorted((r["user_id"], r["n_events"], r["sum_value"]) for r in rows)
    # user 1's first session closes by GAP-SPLIT when the 12:10 event arrives;
    # user 2's session closes by WATERMARK TIMEOUT (wm reaches 12:10 ≥ 10:50).
    # user 1's second session (12:10, timeout 12:40 > wm) stays open: not emitted.
    assert emitted == [(1, 2, 3.0), (2, 2, 12.0)]
    u1 = next(r for r in rows if r["user_id"] == 1)
    assert str(u1["session_start"]).startswith("2020-01-01 10:00:00")
    assert str(u1["session_end"]).startswith("2020-01-01 10:10:00")
    u2 = next(r for r in rows if r["user_id"] == 2)
    assert str(u2["session_start"]).startswith("2020-01-01 10:05:00")
    assert str(u2["session_end"]).startswith("2020-01-01 10:20:00")
