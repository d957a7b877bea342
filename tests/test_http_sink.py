"""HTTP sink tests against a local server: envelope bytes, batch boundaries,
retry-on-transport-error, proceed-on-500 (CsvLoader.java:196-235 matrix)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from csv_loader_spark.sinks.envelope import decode_envelope
from csv_loader_spark.sinks.http import post_bytes, post_partition, write_http


class _Recorder(BaseHTTPRequestHandler):
    payloads: list[bytes] = []
    fail_next_with: list[int] = []  # status codes to return for coming requests

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        status = self.fail_next_with.pop(0) if self.fail_next_with else 200
        if status == 200:
            type(self).payloads.append(body)
        self.send_response(status)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Recorder.payloads = []
    _Recorder.fail_next_with = []
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/locationUpdate", _Recorder
    srv.shutdown()


def _rows(n, start=0):
    return [
        {"vehicle_id": start + i, "lat": 1.0 + i, "lon": 2.0 + i, "ts_millis": i}
        for i in range(n)
    ]


def test_batch_boundaries_and_payload(http_server):
    url, rec = http_server
    sent = post_partition(iter(_rows(25)), url, source_id=99, batch_size=10)
    assert sent == 25
    sizes = [len(decode_envelope(p).messages) for p in rec.payloads]
    assert sizes == [10, 10, 5]  # 10,001-analog grouping + final partial flush
    env = decode_envelope(rec.payloads[0])
    assert env.source_id == 99
    assert env.messages[3][0] == 3
    assert env.messages[3][1] == [(4.0, 5.0, 3)]


def test_http_error_proceeds_as_sent(http_server):
    url, rec = http_server
    rec.fail_next_with = [500]
    status = post_bytes(url, b"payload", max_retries=0)
    assert status == 500  # logged + treated as sent: no retry, no raise


def test_transport_error_retries_then_succeeds(http_server):
    url, rec = http_server
    # a port with no listener → connection refused → retry path; then real URL
    import urllib.error

    with pytest.raises((urllib.error.URLError, OSError)):
        post_bytes("http://127.0.0.1:1/x", b"p", retry_interval=0.05, max_retries=1)
    # against the live server it succeeds without retries
    assert post_bytes(url, b"p2", max_retries=0) == 200
    assert rec.payloads[-1] == b"p2"


def test_transport_failure_after_receipt_duplicates_envelope(http_server):
    """At-least-once parity (CsvLoader.java:226-233): if the POST reaches
    the server but the response is lost, the sender retries and the server
    receives the SAME envelope twice — duplicates are the reference's
    documented behavior on transport errors, reproduced here."""
    url, rec = http_server
    rec.fail_next_with = [-1]  # sentinel: receive body, then drop connection
    original_do_post = rec.do_POST

    def do_post_with_drop(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if type(self).fail_next_with and type(self).fail_next_with[0] == -1:
            type(self).fail_next_with.pop(0)
            type(self).payloads.append(body)  # server DID process it...
            self.connection.close()  # ...but the response never arrives
            return
        type(self).payloads.append(body)
        self.send_response(200)
        self.end_headers()

    rec.do_POST = do_post_with_drop
    try:
        status = post_bytes(url, b"envelope-X", retry_interval=0.05, max_retries=3)
        assert status == 200
        assert rec.payloads == [b"envelope-X", b"envelope-X"]  # duplicate
    finally:
        rec.do_POST = original_do_post


def test_write_http_from_dataframe(spark, http_server):
    url, rec = http_server
    df = spark.createDataFrame(
        [("1", 1, 10, 1.0, 2.0), ("2", 2, 20, 3.0, 4.0), ("3", 3, 30, 5.0, 6.0)],
        "vehicle_id_str string, vehicle_id long, ts_millis long, lat double, lon double",
    ).coalesce(1)
    write_http(df, url, source_id=7, max_retries=2)
    got = sorted(
        (vid, locs[0]) for p in rec.payloads for vid, locs in decode_envelope(p).messages
    )
    assert got == [(1, (1.0, 2.0, 10)), (2, (3.0, 4.0, 20)), (3, (5.0, 6.0, 30))]
