"""Streaming SCD2 maintenance must emit exactly the batch builder's CLOSED
versions: q106's scd2_intervals over the concatenation, minus its CURRENT
rows (those live in streaming state, not output)."""

import json

from csv_loader_spark.queries.relational4 import scd2_intervals
from csv_loader_spark.streaming.scd2 import scd2_current_snapshot, scd2_stream

_SCHEMA = "user_id long, event_id long, ts timestamp, attr string"


def _write_batch(path, rows):
    with open(path, "w") as f:
        for user_id, event_id, ts, attr in rows:
            f.write(
                json.dumps(
                    {"user_id": user_id, "event_id": event_id, "ts": ts, "attr": attr}
                )
                + "\n"
            )


def test_stream_scd2_matches_batch_closed_versions(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    # user 1: run of A (collapses) -> B -> back to A; the B version CLOSES
    # across the batch boundary. user 2: single attr, never closes.
    _write_batch(
        src / "b1.json",
        [
            (1, 10, "2026-01-01 09:00:00", "A"),
            (1, 11, "2026-01-01 09:05:00", "A"),
            (1, 12, "2026-01-01 09:10:00", "B"),
            (2, 20, "2026-01-01 09:00:00", "X"),
        ],
    )
    _write_batch(
        src / "b2.json",
        [
            (1, 13, "2026-01-01 09:20:00", "A"),
            (2, 21, "2026-01-01 09:30:00", "X"),
        ],
    )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_closed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM scd2_closed").collect()
    }

    batch_events = spark.read.schema(_SCHEMA).json(str(src))
    expected = {
        tuple(r)
        for r in scd2_intervals(batch_events)
        .filter("valid_to <> 'CURRENT'")
        .collect()
    }
    assert got == expected
    # the interesting shape: user 1's A-run collapsed into ONE version
    # (opener event_id 10) closed at B's arrival; B closed across the
    # batch boundary at 09:20
    assert (1, 10, "2026-01-01 09:00:00", "2026-01-01 09:10:00", "A") in got
    assert (1, 12, "2026-01-01 09:10:00", "2026-01-01 09:20:00", "B") in got
    # user 2 never changed attr: no closed version emitted
    assert not any(t[0] == 2 for t in got)


def test_out_of_order_event_is_quarantined(spark, tmp_path):
    """A batch arriving BEHIND the fold (late event) must surface as a
    quarantine row (valid_to IS NULL) — never silently mis-fold — and the
    in-order events around it must still build the exact intervals."""
    src = tmp_path / "events"
    src.mkdir()
    _write_batch(
        src / "b1.json",
        [
            (1, 10, "2026-01-01 09:00:00", "A"),
            (1, 12, "2026-01-01 09:10:00", "B"),
        ],
    )
    # batch 2 regresses: event 11 is EARLIER than the already-folded 09:10
    # (a retraction-requiring late arrival), event 13 is in order
    _write_batch(
        src / "b2.json",
        [
            (1, 11, "2026-01-01 09:05:00", "C"),
            (1, 13, "2026-01-01 09:20:00", "A"),
        ],
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM scd2_ooo").collect()
    quarantined = [tuple(r) for r in rows if r["valid_to"] is None]
    closed = {tuple(r) for r in rows if r["valid_to"] is not None}
    # the late event is visible, carrying its own ts and attr
    assert quarantined == [(1, 11, "2026-01-01 09:05:00", None, "C")]
    # the fold ignored it: A closed at B's arrival, B closed at 13's — the
    # intervals C would have corrupted are intact
    assert closed == {
        (1, 10, "2026-01-01 09:00:00", "2026-01-01 09:10:00", "A"),
        (1, 12, "2026-01-01 09:10:00", "2026-01-01 09:20:00", "B"),
    }


def test_stream_plus_state_snapshot_equals_full_batch(spark, tmp_path):
    """scd2_stream output (closed versions) UNION scd2_current_snapshot
    (CURRENT rows read from the checkpoint's state store) must equal the
    batch builder's FULL answer — not minus-CURRENT."""
    src = tmp_path / "events"
    src.mkdir()
    ck = str(tmp_path / "ck")
    _write_batch(
        src / "b1.json",
        [
            (1, 10, "2026-01-01 09:00:00", "A"),
            (1, 11, "2026-01-01 09:05:00", "A"),
            (1, 12, "2026-01-01 09:10:00", "B"),
            (2, 20, "2026-01-01 09:00:00", "X"),
        ],
    )
    _write_batch(
        src / "b2.json",
        [
            (1, 13, "2026-01-01 09:20:00", "A"),
            (2, 21, "2026-01-01 09:30:00", "X"),
            (3, 30, "2026-01-01 09:40:00", "Q"),
        ],
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_full")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_rows = {
        tuple(r) for r in spark.sql("SELECT * FROM scd2_full").collect()
    }
    snapshot_rows = {
        tuple(r) for r in scd2_current_snapshot(spark, ck).collect()
    }
    batch_events = spark.read.schema(_SCHEMA).json(str(src))
    expected = {tuple(r) for r in scd2_intervals(batch_events).collect()}
    assert stream_rows | snapshot_rows == expected
    assert stream_rows.isdisjoint(snapshot_rows)
    # every user has exactly one CURRENT row in the snapshot
    assert sorted(t[0] for t in snapshot_rows) == [1, 2, 3]
    assert all(t[3] == "CURRENT" for t in snapshot_rows)
