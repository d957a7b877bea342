"""Envelope build + protobuf wire-format roundtrip (ops 13-15)."""

from csv_loader_spark.sinks.envelope import (
    decode_envelope,
    encode_envelope,
    to_vehicle_messages,
)
from csv_loader_spark.sinks.kinesis import records_for_kinesis


def test_wire_roundtrip_preserves_values():
    rows = [
        (101, 40.7128, -74.0060, 1433147415000),
        (-5, -33.87, 151.21, 0),
        (2**63 - 1, 0.0, 0.0, 1),
    ]
    env = decode_envelope(encode_envelope(source_id=-42, rows=rows))
    assert env.source_id == -42
    assert [(vid, locs[0]) for vid, locs in env.messages] == [
        (vid, (lat, lon, ts)) for vid, lat, lon, ts in rows
    ]


def test_message_struct_shape(spark):
    df = spark.createDataFrame(
        [("101", 101, 1433147415000, 40.7, -74.0)],
        "vehicle_id_str string, vehicle_id long, ts_millis long, lat double, lon double",
    )
    (row,) = to_vehicle_messages(df).collect()
    msg = row["message"]
    assert msg["vehicleId"] == 101
    assert len(msg["locations"]) == 1  # one location per message (ref :152-155)
    loc = msg["locations"][0]
    assert (loc["lat"], loc["lon"], loc["timestamp"]) == (40.7, -74.0, 1433147415000)


def test_kinesis_chunking_limit():
    rows = [
        {"vehicle_id": i, "lat": 1.0, "lon": 2.0, "ts_millis": i} for i in range(1203)
    ]
    chunks = list(records_for_kinesis(iter(rows), chunk_size=500))
    assert [len(c) for c in chunks] == [500, 500, 203]
    assert chunks[0][0]["PartitionKey"] == "0"
