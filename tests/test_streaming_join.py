"""Stream-stream watermarked interval join (events_stream.attribution_pairs):
the REAL streaming execution (availableNow → memory sink) must produce
exactly the batch-mode pair set on the same data, and the join must be
running as a genuine StreamingSymmetricHashJoin with watermarked state,
not a batch fallback.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.streaming.events_stream import attribution_pairs, stream_events

SF_DIR = "/root/testdata/sf0.001"


def _pair_set(df):
    return sorted(
        (r["user_id"], r["view_id"], r["click_id"])
        for r in df.select("user_id", "view_id", "click_id").collect()
    )


def test_stream_stream_join_equals_batch(spark, tmp_path):
    # one incremental source, split into the two join sides by filter —
    # a self stream-stream join, the attribution shape. The file-stream
    # source needs a DIRECTORY; stage the single-file fixture into one.
    import shutil

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    stream = stream_events(spark, str(src), max_files_per_trigger=1)
    pairs = attribution_pairs(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "click"),
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("attrib_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    progress = q.lastProgress
    got = _pair_set(spark.table("attrib_pairs"))

    e = load_table(spark, SF_DIR, "events")
    want = _pair_set(
        attribution_pairs(
            e.filter(F.col("event_type") == "view"),
            e.filter(F.col("event_type") == "click"),
        )
    )
    assert want, "fixture must produce attributed pairs"
    assert got == want

    # the streaming plan really ran a stateful symmetric hash join with a
    # non-zero watermark (i.e. state is bounded/GC-able, not a batch join)
    ops = progress["stateOperators"]
    assert any("symmetricHashJoin" in op["operatorName"] for op in ops), ops
    assert progress["eventTime"].get("watermark") is not None
