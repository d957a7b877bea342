"""Streaming exact dedup with bounded state: dropDuplicatesWithinWatermark
(the streaming twin of batch q28/dropDuplicates — state is GC'd once the
watermark passes, so it runs forever on unbounded streams)."""

import json


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = [
        {"id": 1, "ts": "2020-01-01 10:00:00"},
        {"id": 1, "ts": "2020-01-01 10:00:05"},  # dup within watermark → dropped
        {"id": 2, "ts": "2020-01-01 10:01:00"},
        {"id": 2, "ts": "2020-01-01 10:01:00"},  # exact dup → dropped
        {"id": 3, "ts": "2020-01-01 10:02:00"},
    ]
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("id bigint, ts timestamp")
        .json(str(src))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.table("dedup_out").collect())
    assert got == [1, 2, 3]
