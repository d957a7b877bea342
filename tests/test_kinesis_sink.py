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
