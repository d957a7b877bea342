"""Streamed trailing-7-day actives == q229's batch answer (stream==batch
twin), including across the max-day horizon advancing and a restart."""

import json

from pyspark.sql import functions as F

from csv_loader_spark.queries.registry import all_specs
from csv_loader_spark.streaming.rolling_actives import (
    start_rolling_actives,
    wau_path,
)

SCHEMA = "ts timestamp, user_id long"


def _write(path, rows):
    with open(path, "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")


def _streamed(spark, out):
    return {
        r["day"]: r["active_users"]
        for r in spark.read.parquet(wau_path(out)).collect()
    }


def test_rolling_actives_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    out = str(tmp_path / "wau_store")
    ckpt = str(tmp_path / "ckpt")
    b1 = [
        ("2020-01-01 10:00:00", 1),
        ("2020-01-01 11:00:00", 2),
        ("2020-01-03 09:00:00", 2),
        ("2020-01-03 12:00:00", 3),
    ]
    # b2 touches an EXISTING day partition (d1 gains user 3) and advances
    # the horizon to d5 — exercising both the merge and the un-clip rule
    b2 = [
        ("2020-01-01 23:00:00", 3),
        ("2020-01-05 08:00:00", 9),
    ]
    _write(src / "b1.json", b1)
    _write(src / "b2.json", b2)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_rolling_actives(stream, out, ckpt, available_now=True)
    q.awaitTermination(180)

    got = _streamed(spark, out)
    # trailing-7d over d1..d5: d1 {1,2,3}; d2-d4 inherit d1(+d3); d5 adds 9
    assert got == {
        "2020-01-01": 3,
        "2020-01-02": 3,
        "2020-01-03": 3,
        "2020-01-04": 3,
        "2020-01-05": 4,
    }

    # true twin: q229's BATCH answer over the same rows
    ev = spark.createDataFrame(
        [(i, r[0], r[1]) for i, r in enumerate(b1 + b2)],
        "event_id long, ts string, user_id long",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    sf_dir = str(tmp_path / "sf")
    ev.write.parquet(sf_dir + "/events.parquet")
    batch = {
        r["day"]: r["active_users"]
        for r in all_specs()["q229_rolling_actives"].fn(spark, sf_dir).collect()
    }
    assert got == batch

    # restart over the same checkpoint: no new files → answer unchanged
    q2 = start_rolling_actives(
        spark.readStream.schema(SCHEMA).json(str(src)),
        out,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(180)
    assert _streamed(spark, out) == got
