"""End-to-end REST I/O: a real local HTTP server serves the plan
(``--planServerURL`` path) and receives the report PUT (``io.writer:
rest``) — closing the last reference I/O path that was only unit-mocked
(VERDICT r5 #8). Reference: tnengine/TnReader.scala (REST reader),
tnengine/TnWriter.scala:115-137 (TnRESTWriter)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

SF = "/root/testdata/sf0.001"


class _Handler(BaseHTTPRequestHandler):
    plans: dict[str, bytes] = {}
    puts: dict[str, bytes] = {}

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        body = self.plans.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):  # noqa: N802
        length = int(self.headers.get("Content-Length", 0))
        self.puts[self.path] = self.rfile.read(length)
        self.send_response(200)
        self.end_headers()

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def http_server():
    _Handler.plans = {}
    _Handler.puts = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Handler
    srv.shutdown()
    srv.server_close()


def test_plan_fetched_via_rest_and_report_put_back(spark, http_server):
    from topnotch_spark.engine import TnEngine

    base, handler = http_server
    plan = {
        "io": {"writer": "rest", "dest": f"{base}/reports/"},
        "commands": [
            {
                "command": "assertion",
                "input": {"ref": f"{SF}/orders.parquet", "onDisk": True},
                "outputKey": "restOrdersCheck",
                "params": {
                    "assertions": [
                        {
                            "query": "o_totalprice > 0",
                            "description": "totalprice positive",
                            "threshold": 0.01,
                        },
                        {
                            "query": "o_orderkey IS NULL",
                            "description": "orderkey null (expected fail)",
                            "threshold": 0.0,
                        },
                    ]
                },
            }
        ],
    }
    handler.plans["/plans/orders_plan.json"] = json.dumps(plan).encode()

    engine = TnEngine(spark)
    num_failed = engine.run(
        "plans/orders_plan.json", plan_server_url=base, report_key="restRun"
    )
    assert num_failed == 1  # the IS NULL rule fails on every row

    body = handler.puts.get("/reports/restRun")
    assert body is not None, f"PUT paths seen: {list(handler.puts)}"
    report = json.loads(body.decode("utf-8"))
    assert isinstance(report, list) and len(report) >= 2  # plan + assertion
    text = json.dumps(report)
    assert "restOrdersCheck" in text
    assert "totalprice positive" in text
    assert "orderkey null (expected fail)" in text

    # the PUT body must be exactly the writer's canonical merged()
    # serialization (json, indent=2) — byte-identical under a parse +
    # re-dump round trip, i.e. no proxy/transfer re-encoding
    assert body.decode("utf-8") == json.dumps(report, indent=2, default=str)


def test_rest_reader_missing_plan_fails_clearly(spark, http_server):
    from topnotch_spark.engine import TnEngine

    base, _ = http_server
    with pytest.raises(Exception):
        TnEngine(spark).run("plans/nope.json", plan_server_url=base)


class _FlakyHandler(_Handler):
    """Fails the first N PUTs per path with the configured status, then
    succeeds — the rolling-deploy hiccup the writer's retry absorbs."""

    fail_first: int = 1
    fail_status: int = 503
    attempts: dict[str, int] = {}

    def do_PUT(self):  # noqa: N802
        n = self.attempts.get(self.path, 0)
        self.attempts[self.path] = n + 1
        if n < self.fail_first:
            length = int(self.headers.get("Content-Length", 0))
            self.rfile.read(length)
            self.send_response(self.fail_status)
            self.end_headers()
            return
        super().do_PUT()


@pytest.fixture()
def flaky_server():
    def make(fail_first: int, fail_status: int = 503):
        _FlakyHandler.plans = {}
        _FlakyHandler.puts = {}
        _FlakyHandler.attempts = {}
        _FlakyHandler.fail_first = fail_first
        _FlakyHandler.fail_status = fail_status
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return f"http://127.0.0.1:{srv.server_address[1]}", _FlakyHandler

    yield make


def test_rest_writer_retries_transient_5xx(flaky_server):
    from topnotch_spark.reports.writers import RESTWriter

    base, handler = flaky_server(fail_first=1, fail_status=503)
    w = RESTWriter(f"{base}/reports/", retries=2, backoff_base_s=0.05)
    w.add_section({"ok": True})
    w.write_report("retryRun")  # must not raise
    assert handler.attempts["/reports/retryRun"] == 2  # 1 failure + 1 ok
    assert handler.puts["/reports/retryRun"] is not None


def test_rest_writer_exhausts_retries_then_raises(flaky_server):
    import urllib.error

    from topnotch_spark.reports.writers import RESTWriter

    base, handler = flaky_server(fail_first=10, fail_status=503)
    w = RESTWriter(f"{base}/reports/", retries=2, backoff_base_s=0.05)
    w.add_section({"ok": True})
    with pytest.raises(urllib.error.HTTPError):
        w.write_report("doomedRun")
    assert handler.attempts["/reports/doomedRun"] == 3  # 1 + 2 retries


def test_rest_writer_does_not_retry_4xx(flaky_server):
    import urllib.error

    from topnotch_spark.reports.writers import RESTWriter

    base, handler = flaky_server(fail_first=10, fail_status=400)
    w = RESTWriter(f"{base}/reports/", retries=3, backoff_base_s=0.05)
    w.add_section({"ok": True})
    with pytest.raises(urllib.error.HTTPError):
        w.write_report("clientErr")
    assert handler.attempts["/reports/clientErr"] == 1  # no retry on 4xx


def test_rest_writer_retries_configurable_from_plan_io():
    from topnotch_spark.reports.writers import RESTWriter, get_writer

    w = get_writer(
        {"io": {"writer": "rest", "dest": "http://x/", "retries": 5,
                "backoffBaseS": 0.01}}
    )
    assert isinstance(w, RESTWriter)
    assert w.retries == 5 and w.backoff_base_s == 0.01
