"""events_stream.windowed_counts: one function, two execution modes —
batch result must equal the inline q22 batch aggregation, and the
streaming run (availableNow) must produce the same rows."""

from csv_loader_spark.io.tables import load_table
from csv_loader_spark.queries.registry import all_specs
from csv_loader_spark.streaming.events_stream import stream_events, windowed_counts

SF_DIR = "/root/testdata/sf0.001"


def _key(rows):
    return sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in rows
    )


def test_batch_mode_matches_q22(spark):
    e = load_table(spark, SF_DIR, "events")
    got = _key(windowed_counts(e).collect())
    q22 = _key(all_specs()["q22_tumbling_window"].fn(spark, SF_DIR).collect())
    assert got == q22


def test_streaming_mode_matches_batch(spark, tmp_path):
    import shutil

    src = str(tmp_path / "events_dir")
    import os

    os.makedirs(src)
    shutil.copy(f"{SF_DIR}/events.parquet", src)
    stream = stream_events(spark, src)
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = _key(windowed_counts(load_table(spark, SF_DIR, "events")).collect())
    assert _key(spark.table("wc_out").collect()) == batch
