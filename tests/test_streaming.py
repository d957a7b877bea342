"""Structured Streaming ingestion: availableNow drain → foreachBatch HTTP
sink, checkpointed resume, reference-parity progress metrics."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from conftest import NARROW_ROWS, write_narrow_csv

from csv_loader_spark.sinks.envelope import decode_envelope
from csv_loader_spark.streaming.pings import stream_pings, write_stream_http


class _Recorder(BaseHTTPRequestHandler):
    payloads: list[bytes] = []

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).payloads.append(body)
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):
        pass


@pytest.fixture()
def http_server():
    _Recorder.payloads = []
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}/locationUpdate", _Recorder
    srv.shutdown()


def _decoded_ids(rec):
    return sorted(
        vid for p in rec.payloads for vid, _ in decode_envelope(p).messages
    )


def test_stream_end_to_end_and_resume(spark, tmp_path, http_server):
    url, rec = http_server
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_narrow_csv(str(src / "batch1.csv"))

    pings = stream_pings(spark, str(src))
    query, metrics = write_stream_http(
        pings, url, source_id=5, checkpoint_dir=ckpt, available_now=True, max_retries=2
    )
    query.awaitTermination(120)
    expected_ids = sorted(vid for _, (vid, *_ ) in NARROW_ROWS)
    assert _decoded_ids(rec) == expected_ids
    assert metrics.records == len(NARROW_ROWS)
    # DEFAULT path is the scale-safe approx mode: cardinality comes from
    # approx_count_distinct (exact at this tiny cardinality) and NO id rows
    # are ever materialized on the driver — the unbounded sets stay empty.
    assert metrics.approx_vehicles == len(NARROW_ROWS)
    assert metrics.approx_ids == len(NARROW_ROWS)
    assert len(metrics.vehicles_str) == 0 and len(metrics.vehicle_ids) == 0

    # resume from checkpoint: only NEW files are processed (exactly-once source)
    rec.payloads = []
    with open(src / "batch2.csv", "w") as f:
        f.write("2015-06-01 10:00:00+00,900,10.0,20.0\n")
    pings2 = stream_pings(spark, str(src))
    query2, _ = write_stream_http(
        pings2, url, source_id=5, checkpoint_dir=ckpt, available_now=True, max_retries=2
    )
    query2.awaitTermination(120)
    assert _decoded_ids(rec) == [900]  # batch1 NOT re-sent


def test_stream_exact_metrics_is_reference_parity_opt_in(
    spark, tmp_path, http_server
):
    """metrics='exact' reproduces the reference's unbounded dual HashSet
    counts (CsvLoader.java:105-106) — opt-in, driver-side sets populated."""
    url, rec = http_server
    src = tmp_path / "incoming"
    src.mkdir()
    write_narrow_csv(str(src / "batch1.csv"))

    pings = stream_pings(spark, str(src))
    query, metrics = write_stream_http(
        pings,
        url,
        source_id=5,
        checkpoint_dir=str(tmp_path / "ckpt_exact"),
        available_now=True,
        max_retries=2,
        metrics="exact",
    )
    query.awaitTermination(120)
    assert metrics.records == len(NARROW_ROWS)
    assert len(metrics.vehicles_str) == len(NARROW_ROWS)
    assert len(metrics.vehicle_ids) == len(NARROW_ROWS)


def test_approx_metric_is_cumulative_union_across_batches(
    spark, tmp_path, http_server
):
    """Disjoint vehicle sets across micro-batches must produce a CUMULATIVE
    distinct estimate (HLL sketch union), not the max single-batch count —
    max-of-batches would report ~80 here, the union ~140 (VERDICT r5
    'What's wrong' #2)."""
    url, _rec = http_server
    src = tmp_path / "incoming"
    src.mkdir()
    with open(src / "a.csv", "w") as f:
        for vid in range(1, 61):  # 60 vehicles
            f.write(f"2015-06-01 10:00:00+00,{vid},10.0,20.0\n")
    with open(src / "b.csv", "w") as f:
        for vid in range(1001, 1081):  # 80 DISJOINT vehicles
            f.write(f"2015-06-01 10:01:00+00,{vid},10.0,20.0\n")

    pings = stream_pings(spark, str(src), max_files_per_trigger=1)
    query, metrics = write_stream_http(
        pings,
        url,
        source_id=5,
        checkpoint_dir=str(tmp_path / "ckpt_union"),
        available_now=True,
        max_retries=2,
    )
    query.awaitTermination(180)
    assert metrics.records == 140
    # strictly more than any single batch (the provable max-of-batches bug)
    assert metrics.approx_vehicles > 80
    assert metrics.approx_ids > 80
    # within HLL error (~2% at lgConfigK=12; generous 5% band) of exact 140
    assert abs(metrics.approx_vehicles - 140) <= 7
    assert abs(metrics.approx_ids - 140) <= 7
    # bounded state: sketches present, unbounded exact sets untouched
    assert metrics.hll_vehicles is not None
    assert len(metrics.vehicles_str) == 0 and len(metrics.vehicle_ids) == 0


def test_batch_metrics_skip_replayed_batch_id(spark):
    """foreachBatch is at-least-once: a failed batch replays under the
    SAME batch_id. The records counter must not double-count (ADVICE r6 —
    the HLL union is idempotent under replay, the counter was not)."""
    from csv_loader_spark.streaming.pings import IngestMetrics, update_batch_metrics

    batch0 = spark.createDataFrame(
        [("1", 1), ("2", 2), ("3", 3)], "vehicle_id_str string, vehicle_id long"
    )
    batch1 = spark.createDataFrame(
        [("4", 4), ("5", 5)], "vehicle_id_str string, vehicle_id long"
    )
    for mode in ("approx", "exact"):
        m = IngestMetrics()
        update_batch_metrics(m, batch0, 0, mode)
        update_batch_metrics(m, batch0, 0, mode)  # replay: same id, same data
        assert m.records == 3, mode
        update_batch_metrics(m, batch1, 1, mode)
        assert m.records == 5, mode
        update_batch_metrics(m, batch0, 0, mode)  # late replay of an OLD id
        assert m.records == 5 and m.last_batch_id == 1, mode
    # exact mode: distinct sets correct after replays
    assert len(m.vehicles_str) == 5 and len(m.vehicle_ids) == 5
