"""HttpFetcher integration against a local stdlib HTTP server:
retry/backoff, 404-body passthrough, redirect final-URL semantics,
and login-hook invocation."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from etl_procedure_codes_crawler_spark.sources.fetcher import HttpFetcher

FLAKY_FAILURES = 2


class _Handler(BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *args):  # silence test output
        pass

    def do_GET(self):
        if self.path == "/ok":
            self._respond(200, "<html><body>page ok</body></html>")
        elif self.path == "/missing":
            self._respond(404, "<html><div class='container404'>gone</div></html>")
        elif self.path == "/flaky":
            type(self).flaky_hits += 1
            if type(self).flaky_hits <= FLAKY_FAILURES:
                self._respond(503, "try later")
            else:
                self._respond(200, "<html>recovered</html>")
        elif self.path == "/moved":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
        else:
            self._respond(500, "boom")

    def _respond(self, status: int, body: str):
        payload = body.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}/"
    httpd.shutdown()


def test_fetch_success_carries_final_url(server):
    fetcher = HttpFetcher(base_url=server, backoff=0.01)
    result = fetcher.fetch("ok")
    assert "page ok" in result.html and result.error is None
    assert result.url.endswith("/ok")
    fetcher.close()


def test_404_body_passes_through_for_parsing(server):
    # the reference parses 404 pages (container404 guard) — the fetch
    # layer must hand the body over, not raise
    fetcher = HttpFetcher(base_url=server, backoff=0.01)
    result = fetcher.fetch("missing")
    assert result.error is None and "container404" in result.html
    fetcher.close()


def test_bounded_retries_recover_from_transient_errors(server):
    _Handler.flaky_hits = 0
    fetcher = HttpFetcher(base_url=server, max_retries=3, backoff=0.01)
    result = fetcher.fetch("flaky")
    assert result.error is None and "recovered" in result.html
    assert _Handler.flaky_hits == FLAKY_FAILURES + 1  # 2 failures + success
    fetcher.close()


def test_retries_exhausted_returns_error_not_raise(server):
    fetcher = HttpFetcher(base_url=server, max_retries=2, backoff=0.01)
    result = fetcher.fetch("always-500")
    assert result.html is None and "500" in result.error
    fetcher.close()


def test_redirect_reports_post_redirect_url(server):
    # CPT/HCPCS classification reads the FINAL url (SURVEY F21 /
    # procedure_code.py:550) — a fetcher hiding redirects breaks it
    fetcher = HttpFetcher(base_url=server, backoff=0.01)
    result = fetcher.fetch("moved")
    assert result.url.endswith("/ok") and "page ok" in result.html
    fetcher.close()


def test_login_hook_runs_once_at_construction(server):
    calls = []
    fetcher = HttpFetcher(base_url=server, login=lambda s: calls.append(s), backoff=0.01)
    fetcher.fetch("ok")
    fetcher.fetch("ok")
    assert len(calls) == 1  # session-scoped, not per-fetch
    fetcher.close()
