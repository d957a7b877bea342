"""Incremental hourly rollup equals the batch recompute; re-delivered
batches are idempotent."""

import json

from pyspark.sql import functions as F

from csv_loader_spark.streaming.continuous_agg import start_hourly_rollup

SCHEMA = "ts timestamp, event_type string, value double"


def _write(path, rows):
    with open(path, "w") as f:
        for ts, et, v in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")


def test_incremental_rollup_matches_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    b1 = [
        ("2020-01-01 10:05:00", "click", 1.0),
        ("2020-01-01 10:40:00", "click", 2.0),
        ("2020-01-01 11:05:00", "view", 3.0),
    ]
    b2 = [
        ("2020-01-01 10:10:00", "click", 4.0),  # same hour as b1 → must merge
        ("2020-01-02 09:00:00", "view", 5.0),  # new day partition
    ]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_hourly_rollup(stream, out, ckpt, available_now=True)
    q.awaitTermination(180)

    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2020-01-01 10:00:00", "click"): (3, 7.0),
        ("2020-01-01 11:00:00", "view"): (1, 3.0),
        ("2020-01-02 09:00:00", "view"): (1, 5.0),
    }

    # idempotence: restart over the same checkpoint → no new data, no change
    q2 = start_hourly_rollup(
        spark.readStream.schema(SCHEMA).json(str(src)), out, ckpt, available_now=True
    )
    q2.awaitTermination(180)
    total = spark.read.parquet(out).agg(F.sum("n_events")).collect()[0][0]
    assert total == 5
