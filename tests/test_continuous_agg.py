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


def test_priority_view_stream_merge_equals_full_recompute(spark, tmp_path):
    """q217's streaming twin: maintain the per-priority view over a
    growing orders fact via foreachBatch ivm_partial/ivm_merge and assert
    the streamed view equals a full batch recompute after every growth
    step (the q147 changelog-parity shape); re-delivery is idempotent."""
    from csv_loader_spark.queries.analytics3 import ivm_merge, ivm_partial
    from csv_loader_spark.streaming.continuous_agg import start_priority_view

    src = tmp_path / "orders"
    src.mkdir()
    out = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    schema = "o_orderpriority string, o_totalprice double"

    b1 = [("1-URGENT", 10.004), ("2-HIGH", 20.25), ("1-URGENT", 5.015)]
    b2 = [("2-HIGH", 1.0), ("3-MEDIUM", 7.77)]

    def _write(name, rows):
        with open(src / name, "w") as f:
            for p, v in rows:
                f.write(json.dumps({"o_orderpriority": p, "o_totalprice": v}) + "\n")

    def _view():
        return {
            r["o_orderpriority"]: (
                r["n_orders"], r["sum_cents"], r["min_cents"], r["max_cents"]
            )
            for r in spark.read.parquet(out).collect()
        }

    def _full_recompute(rows):
        df = spark.createDataFrame(rows, schema).select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        return {
            r["o_orderpriority"]: (
                r["n_orders"], r["sum_cents"], r["min_cents"], r["max_cents"]
            )
            for r in ivm_merge(ivm_partial(df)).collect()
        }

    def _run():
        q = start_priority_view(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src)),
            out,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(180)

    _write("b1.json", b1)
    _run()
    assert _view() == _full_recompute(b1)

    _write("b2.json", b2)  # the fact grows; only the delta streams
    _run()
    assert _view() == _full_recompute(b1 + b2)
    # exact cents (5.015 is 5.01499… in binary → round() gives 501)
    assert _view()["1-URGENT"] == (2, 1501, 501, 1000)

    _run()  # replay over the same checkpoint: no new data, no change
    assert _view() == _full_recompute(b1 + b2)
