"""Streaming CUSUM monitor (streaming/cusum_monitor.py): the statistic
folds identically whether the series arrives in one batch or three
(stream == batch), alarms fire where the pure recursion says, and
redeliveries are quarantined, never double-folded."""

import json

from csv_loader_spark.streaming.cusum_monitor import cusum_fold, cusum_stream

_SCHEMA = "key string, seq long, x double"

MU0, SLACK, H = 10.0, 0.5, 6.0
# drifts up from seq 6: alarm expected once the excess accumulates
SERIES = [10.0, 9.5, 10.2, 9.8, 10.1, 10.0, 13.0, 13.5, 12.8, 13.2, 9.9, 10.0]


_MTIME = [1_700_000_000]


def _write_batch(path, rows):
    with open(path, "w") as f:
        for key, seq, x in rows:
            f.write(json.dumps({"key": key, "seq": seq, "x": x}) + "\n")
    # the file source orders micro-batches by modification time; same-ms
    # writes tie and can be picked up out of order — pin strictly
    # increasing mtimes so batch order matches write order
    import os

    _MTIME[0] += 10
    os.utime(path, (_MTIME[0], _MTIME[0]))


def _run(spark, src):
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        cusum_stream(stream, MU0, SLACK, H)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM cusum_out ORDER BY seq").collect()


def test_stream_equals_pure_fold_across_batches(spark, tmp_path):
    src = tmp_path / "obs"
    src.mkdir()
    rows = [("m", i, x) for i, x in enumerate(SERIES)]
    # three uneven micro-batches
    _write_batch(src / "b1.json", rows[:4])
    _write_batch(src / "b2.json", rows[4:9])
    _write_batch(src / "b3.json", rows[9:])
    got = _run(spark, src)
    expect = cusum_fold(SERIES, MU0, SLACK, H)
    assert len(got) == len(SERIES)
    for r, (sp, sn, alarm) in zip(got, expect):
        assert not r["stale"]
        assert r["s_pos"] == sp and r["s_neg"] == sn and r["alarm"] == alarm
    # the planted upward drift must actually alarm, and only after seq 6
    alarms = [r["seq"] for r in got if r["alarm"]]
    assert alarms and min(alarms) >= 6


def test_redelivered_batch_does_not_double_fold(spark, tmp_path):
    src = tmp_path / "obs"
    src.mkdir()
    rows = [("m", i, x) for i, x in enumerate(SERIES[:6])]
    _write_batch(src / "b1.json", rows)
    _write_batch(src / "b2.json", rows)  # full redelivery
    got = _run(spark, src)
    fresh = [r for r in got if not r["stale"]]
    stale = [r for r in got if r["stale"]]
    assert len(fresh) == 6 and len(stale) == 6
    expect = cusum_fold(SERIES[:6], MU0, SLACK, H)
    for r, (sp, sn, alarm) in zip(sorted(fresh, key=lambda r: r["seq"]), expect):
        assert r["s_pos"] == sp and r["s_neg"] == sn and r["alarm"] == alarm


def test_pure_fold_resets_after_alarm():
    out = cusum_fold([20.0, 10.0, 20.0], 10.0, 0.5, 5.0)
    assert out[0][2] is True  # first spike alarms immediately (9.5 > 5)
    # statistic restarted: second spike re-accumulates from zero
    assert out[1][0] == 0.0
    assert out[2][0] == 9.5 and out[2][2] is True


def test_within_batch_duplicate_seq_is_stale_and_deterministic(spark, tmp_path):
    """A retried observation inside ONE micro-batch: exactly one copy
    (the lowest x) folds, the rest surface as stale rows."""
    src = tmp_path / "obs"
    src.mkdir()
    _write_batch(src / "b1.json", [("m", 0, 12.0), ("m", 1, 30.0), ("m", 1, 9.0)])
    got = _run(spark, src)
    fresh = sorted((r["seq"], r["x"]) for r in got if not r["stale"])
    stale = [(r["seq"], r["x"]) for r in got if r["stale"]]
    assert fresh == [(0, 12.0), (1, 9.0)]  # lowest x folded for seq 1
    assert stale == [(1, 30.0)]
    expect = cusum_fold([12.0, 9.0], MU0, SLACK, H)
    folded = sorted(
        ((r["seq"], r["s_pos"], r["s_neg"]) for r in got if not r["stale"])
    )
    assert [(sp, sn) for _, sp, sn in folded] == [(sp, sn) for sp, sn, _ in expect]
