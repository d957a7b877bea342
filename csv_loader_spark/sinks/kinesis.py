"""Kinesis sink — the reference ADVERTISES Kinesis (README.md:2, aws-sdk in
pom.xml:100-104) but ships no Kinesis code; this is the declared-target
implementation (SURVEY §2.1 "Sinks beyond HTTP").

Shape: ``put_records`` in chunks of ≤500 (the Kinesis API limit), partition
key = vehicle_id so per-vehicle ordering holds within a shard — the property
downstream map-matching needs (SURVEY §7.4.5). Executor-side via
``foreachPartition``; one boto3 client per partition.

boto3 is not installed in this container — the import is gated and the sink
raises a clear error at call time; the chunking/partition-key logic is
testable via ``records_for_kinesis`` without AWS.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

from csv_loader_spark.sinks.envelope import encode_message

try:  # pragma: no cover - absent in the test container
    import boto3  # type: ignore
except ImportError:  # pragma: no cover
    boto3 = None

PUT_RECORDS_LIMIT = 500  # Kinesis PutRecords hard cap per call


def records_for_kinesis(
    rows: Iterable, *, chunk_size: int = PUT_RECORDS_LIMIT
) -> Iterator[list[dict]]:
    """Rows → PutRecords entry chunks: Data = one-location protobuf
    VehicleMessage, PartitionKey = vehicle_id (per-vehicle shard ordering)."""
    chunk: list[dict] = []
    for r in rows:
        chunk.append(
            {
                "Data": encode_message(
                    r["vehicle_id"], [(r["lat"], r["lon"], r["ts_millis"])]
                ),
                "PartitionKey": str(r["vehicle_id"]),
            }
        )
        if len(chunk) >= chunk_size:
            yield chunk
            chunk = []
    if chunk:
        yield chunk


def write_kinesis(pings: DataFrame, stream_name: str, region: str | None = None) -> None:
    if boto3 is None:
        raise NotImplementedError(
            "boto3 is not available in this environment; Kinesis delivery is "
            "stubbed (chunking logic is tested via records_for_kinesis)"
        )

    def _send(rows: Iterable) -> None:  # pragma: no cover - needs AWS
        client = boto3.client("kinesis", region_name=region)
        for chunk in records_for_kinesis(rows):
            client.put_records(StreamName=stream_name, Records=chunk)

    pings.foreachPartition(_send)
