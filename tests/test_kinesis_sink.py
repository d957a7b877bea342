"""End-to-end Kinesis sink test with a fake boto3-shaped client (r7,
ADVICE): the REAL chunking / partition-key / partial-failure-retry path
runs executor-side through foreachPartition — no boto3, no AWS. The fake
records every PutRecords call to a shared directory (the executor is a
separate Python worker process, so plain in-memory capture can't cross)."""

import json
import os
import sys
import uuid

import pytest
from pyspark import cloudpickle

from csv_loader_spark.sinks.kinesis import (
    PUT_RECORDS_LIMIT,
    put_records_with_retry,
    write_kinesis,
)

# The fake client class rides the foreachPartition closure to executor
# worker PROCESSES, which don't have tests/ on their path — ship this
# module by value instead of by reference.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

_THROTTLE = "ProvisionedThroughputExceededException"


class FakeKinesisClient:
    """boto3-shaped: first call per client throttles every 7th record
    (Kinesis partial failure: HTTP 200, per-record ErrorCode, response
    order == request order); later calls deliver everything."""

    def __init__(self, log_dir):
        self.log_dir = log_dir
        self.calls = 0

    def put_records(self, StreamName, Records):
        self.calls += 1
        throttle = self.calls == 1
        results, delivered = [], []
        for i, rec in enumerate(Records):
            if throttle and i % 7 == 0:
                results.append({"ErrorCode": _THROTTLE, "ErrorMessage": "slow down"})
            else:
                results.append({"SequenceNumber": str(i), "ShardId": "shard-0"})
                delivered.append(rec["PartitionKey"])
        path = os.path.join(self.log_dir, f"{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(
                {"stream": StreamName, "n": len(Records), "delivered": delivered}, f
            )
        return {
            "FailedRecordCount": len(Records) - len(delivered),
            "Records": results,
        }


def test_write_kinesis_end_to_end_chunks_and_retries(spark, tmp_path):
    log_dir = str(tmp_path)
    n = 1200
    pings = spark.createDataFrame(
        [(i, 10.0 + i * 1e-4, 20.0, 1_433_147_415_000 + i) for i in range(n)],
        "vehicle_id long, lat double, lon double, ts_millis long",
    ).repartition(1)

    write_kinesis(
        pings,
        "traffic-stream",
        client_factory=lambda: FakeKinesisClient(log_dir),
        retry_interval=0.0,
    )

    calls = [json.load(open(os.path.join(log_dir, p))) for p in os.listdir(log_dir)]
    # 1200 rows on one partition = chunks of 500/500/200, plus ONE re-put
    # of exactly the 72 records the first call throttled (ceil(500/7))
    assert len(calls) == 4
    assert sorted(c["n"] for c in calls) == [72, 200, 500, 500]
    assert all(c["n"] <= PUT_RECORDS_LIMIT for c in calls)
    assert all(c["stream"] == "traffic-stream" for c in calls)
    # at-least-once, all-delivered: every vehicle lands exactly once here
    # (the retry re-put only the failed subset, not the whole chunk)
    delivered = [k for c in calls for k in c["delivered"]]
    assert len(delivered) == n
    assert sorted(map(int, delivered)) == list(range(n))


def test_write_kinesis_partition_key_is_vehicle_id(spark, tmp_path):
    log_dir = str(tmp_path)
    pings = spark.createDataFrame(
        [(42, 1.0, 2.0, 1000), (42, 1.1, 2.1, 2000), (7, 9.0, 9.0, 3000)],
        "vehicle_id long, lat double, lon double, ts_millis long",
    ).coalesce(1)
    write_kinesis(
        pings,
        "s",
        client_factory=lambda: FakeKinesisClient(log_dir),
        retry_interval=0.0,
    )
    calls = [json.load(open(os.path.join(log_dir, p))) for p in os.listdir(log_dir)]
    keys = sorted(k for c in calls for k in c["delivered"])
    assert keys == ["42", "42", "7"]  # shard ordering rides vehicle_id


class _AlwaysThrottling:
    def put_records(self, StreamName, Records):
        return {
            "FailedRecordCount": len(Records),
            "Records": [{"ErrorCode": _THROTTLE} for _ in Records],
        }


class _FlakyTransport:
    """One connection reset, then clean delivery — the HTTP-sink matrix's
    transport branch mapped onto Kinesis."""

    def __init__(self):
        self.calls = 0

    def put_records(self, StreamName, Records):
        self.calls += 1
        if self.calls == 1:
            raise ConnectionResetError("peer reset")
        return {
            "FailedRecordCount": 0,
            "Records": [{"SequenceNumber": str(i)} for i in range(len(Records))],
        }


def test_put_records_retry_gives_up_after_max_retries():
    chunk = [{"Data": b"x", "PartitionKey": "1"}] * 3
    with pytest.raises(RuntimeError, match="still failing after 2 retries"):
        put_records_with_retry(
            _AlwaysThrottling(), "s", chunk, retry_interval=0.0, max_retries=2
        )


def test_put_records_retries_transport_errors():
    client = _FlakyTransport()
    attempts = put_records_with_retry(
        client, "s", [{"Data": b"x", "PartitionKey": "1"}], retry_interval=0.0
    )
    assert client.calls == 2 and attempts == 2


class _Malformed:
    """Response contract violations must RAISE, never silently drop."""

    def __init__(self, resp_fn):
        self.resp_fn = resp_fn

    def put_records(self, StreamName, Records):
        return self.resp_fn(Records)


def test_put_records_raises_on_malformed_responses():
    chunk = [{"Data": b"x", "PartitionKey": str(i)} for i in range(3)]
    # missing keys entirely
    with pytest.raises(RuntimeError, match="malformed PutRecords response"):
        put_records_with_retry(_Malformed(lambda r: {}), "s", chunk)
    # Records array shorter than the request (zip would silently truncate)
    with pytest.raises(RuntimeError, match="response out of sync"):
        put_records_with_retry(
            _Malformed(
                lambda r: {"FailedRecordCount": 3, "Records": [{"ErrorCode": "X"}]}
            ),
            "s",
            chunk,
        )
    # FailedRecordCount>0 but no per-record ErrorCode
    with pytest.raises(RuntimeError, match="no record carries an ErrorCode"):
        put_records_with_retry(
            _Malformed(
                lambda r: {
                    "FailedRecordCount": 1,
                    "Records": [{"SequenceNumber": "0"} for _ in r],
                }
            ),
            "s",
            chunk,
        )


# ---------------------------------------------------------------------------
# moto-backed contract tests (r12): the REAL boto3 client marshalling —
# botocore parameter validation, response shapes (FailedRecordCount,
# SequenceNumber), and a true read-back through shard iterators — against
# moto's Kinesis backend. The fake-client tests above prove the
# chunk/retry/foreachPartition plumbing; these prove the payload survives
# a genuine client round trip. Driver-side on purpose: moto patches
# botocore IN-PROCESS, and a foreachPartition body runs in a separate
# Python worker where the patch is absent — the executor plumbing is
# already covered by the fake-client end-to-end test.
# ---------------------------------------------------------------------------

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")


def _moto_stream(name="vehicles", shards=2):
    client = boto3.client("kinesis", region_name="us-east-1")
    client.create_stream(StreamName=name, ShardCount=shards)
    return client


def _read_all_records(client, stream_name):
    out = []
    shards = client.list_shards(StreamName=stream_name)["Shards"]
    for sh in shards:
        it = client.get_shard_iterator(
            StreamName=stream_name,
            ShardId=sh["ShardId"],
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        while it:
            resp = client.get_records(ShardIterator=it, Limit=1000)
            out.extend(resp["Records"])
            if not resp["Records"]:
                break
            it = resp.get("NextShardIterator")
    return out


@moto.mock_aws
def test_put_records_real_client_roundtrip():
    """1,200 pings → 3 PutRecords chunks through a REAL boto3 client
    (moto backend): every record lands, partition keys survive, and the
    protobuf payload read back from the shards decodes to the original
    (vehicle_id, lat, lon, ts)."""
    import struct as _struct

    from csv_loader_spark.sinks.envelope import _fields, _signed64
    from csv_loader_spark.sinks.kinesis import (
        put_records_with_retry,
        records_for_kinesis,
    )

    def _decode_vehicle_message(body: bytes):
        # the Data payload is a bare VehicleMessage (field1 vehicleId
        # varint, field2 repeated Location) — walk it with the envelope
        # module's field reader
        vid, locs = 0, []
        for fno, _, val in _fields(body):
            if fno == 1:
                vid = _signed64(val)
            elif fno == 2:
                lat = lon = 0.0
                ts = 0
                for lf, _, lv in _fields(val):
                    if lf == 1:
                        lat = _struct.unpack("<d", lv)[0]
                    elif lf == 2:
                        lon = _struct.unpack("<d", lv)[0]
                    elif lf == 3:
                        ts = _signed64(lv)
                locs.append((lat, lon, ts))
        return vid, locs

    client = _moto_stream()
    rows = [
        {"vehicle_id": i, "lat": 45.0 + i / 1000.0, "lon": -122.0, "ts_millis": 1_000 + i}
        for i in range(1200)
    ]
    chunks = list(records_for_kinesis(iter(rows)))
    assert [len(c) for c in chunks] == [500, 500, 200]
    for chunk in chunks:
        attempts = put_records_with_retry(client, "vehicles", chunk)
        assert attempts == 1
    got = _read_all_records(client, "vehicles")
    assert len(got) == 1200
    decoded = {}
    for rec in got:
        vid, locs = _decode_vehicle_message(rec["Data"])
        assert rec["PartitionKey"] == str(vid)
        decoded[vid] = locs[0]
    assert set(decoded) == set(range(1200))
    # bit-exact doubles: the wire format is fixed64, so the read-back
    # value must equal the input float exactly, not approximately
    assert decoded[7] == (rows[7]["lat"], rows[7]["lon"], rows[7]["ts_millis"])


@moto.mock_aws
def test_put_records_real_client_rejects_bad_entries():
    """botocore's parameter validation is part of the real-client
    contract the fake client cannot exercise: a record missing
    PartitionKey must raise ParamValidationError, not silently drop."""
    from botocore.exceptions import ParamValidationError

    from csv_loader_spark.sinks.kinesis import put_records_with_retry

    client = _moto_stream(name="strict", shards=1)
    with pytest.raises((ParamValidationError, RuntimeError)):
        # missing PartitionKey: the real client refuses to marshal it
        client.put_records(
            StreamName="strict", Records=[{"Data": b"\x08\x01"}]
        )
    # and the retry wrapper passes a well-formed chunk straight through
    assert (
        put_records_with_retry(
            client, "strict", [{"Data": b"\x08\x01", "PartitionKey": "1"}]
        )
        == 1
    )
