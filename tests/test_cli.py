"""CLI parity: -f/-u contract, missing-file message, end-to-end POST, dry-run
metrics line in the reference's format."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from conftest import NARROW_ROWS, write_narrow_csv

from csv_loader_spark.cli import main
from csv_loader_spark.sinks.envelope import decode_envelope


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


def test_missing_file_is_error_not_traceback(capsys):
    assert main(["-f", "/nonexistent/x.csv"]) == 1
    assert "file not found" in capsys.readouterr().err


def test_missing_f_flag_exits():
    with pytest.raises(SystemExit):
        main([])


def test_end_to_end_post_and_progress_line(spark, tmp_path, http_server, capsys):
    url, rec = http_server
    path = str(tmp_path / "pings.csv")
    write_narrow_csv(path)
    assert main(["-f", path, "-u", url, "--max-retries", "2"]) == 0
    out = capsys.readouterr().out
    # reference progress-line format (CsvLoader.java:165)
    assert f"0.00M records loaded, {len(NARROW_ROWS)} unique vehicles" in out
    sent = sorted(
        vid for p in rec.payloads for vid, _ in decode_envelope(p).messages
    )
    assert sent == sorted(vid for _, (vid, *_ ) in NARROW_ROWS)


def test_dry_run_sends_nothing(spark, tmp_path, http_server, capsys):
    url, rec = http_server
    path = str(tmp_path / "pings.csv")
    write_narrow_csv(path)
    assert main(["-f", path, "-u", url, "--dry-run"]) == 0
    assert rec.payloads == []
    assert "unique vehicles" in capsys.readouterr().out
