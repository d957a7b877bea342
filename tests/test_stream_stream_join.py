"""Stream-stream interval join with watermarks on both sides (impression ⋈
click attribution — the canonical shape; state on both sides is bounded by
the watermark + interval)."""

import json

from pyspark.sql import functions as F


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_interval_attribution_join(spark, tmp_path):
    imp_dir = tmp_path / "imps"
    click_dir = tmp_path / "clicks"
    imp_dir.mkdir()
    click_dir.mkdir()
    _write(
        imp_dir / "b1.json",
        [
            {"ad_id": 1, "imp_ts": "2020-01-01 10:00:00"},
            {"ad_id": 2, "imp_ts": "2020-01-01 10:00:00"},
            {"ad_id": 3, "imp_ts": "2020-01-01 10:00:00"},
        ],
    )
    _write(
        click_dir / "b1.json",
        [
            {"ad_id": 1, "click_ts": "2020-01-01 10:05:00"},  # within 10 min → match
            {"ad_id": 2, "click_ts": "2020-01-01 10:30:00"},  # too late → no match
            {"ad_id": 9, "click_ts": "2020-01-01 10:01:00"},  # no impression
        ],
    )
    imps = (
        spark.readStream.schema("ad_id bigint, imp_ts timestamp")
        .json(str(imp_dir))
        .withWatermark("imp_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema("ad_id bigint, click_ts timestamp")
        .json(str(click_dir))
        .withWatermark("click_ts", "1 hour")
    )
    joined = imps.join(
        clicks,
        (imps["ad_id"] == clicks["ad_id"])
        & (clicks["click_ts"] >= imps["imp_ts"])
        & (clicks["click_ts"] <= imps["imp_ts"] + F.expr("interval 10 minutes")),
        "inner",
    )
    q = (
        joined.select(imps["ad_id"], "imp_ts", "click_ts")
        .writeStream.format("memory")
        .queryName("attrib_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["ad_id"] for r in spark.table("attrib_out").collect()]
    assert got == [1]
