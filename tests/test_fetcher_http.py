"""Real-HTTP fetch path driven by an in-process http.server.

The ``mode="http"`` fetcher (sources/fetcher.py:_http_fetch_batch) is
the production surface the sandbox can't hit over the network; this
serves the SAME deterministic payloads from 127.0.0.1 and asserts:

* span-sequence equality — a page fetched over real HTTP parses to the
  exact spans the synthetic path (and fixtures.synth_spans ground
  truth) produces for the same payload;
* 404 → status='failed', empty page (reference analog: swallow-and-skip,
  data_processing/data_fetching_processing.py:195-196);
* a response slower than the socket timeout → status='failed'
  (reference analog: the 10 s timeout at
  old_scripts/fide-games-scraper-public.py:22 and @retry at :48 —
  failures surface as rows the scheduler can retry, never exceptions).

The server runs in a daemon thread; Spark's python workers are separate
processes on the same host, so requests really cross a socket.
"""

from __future__ import annotations

import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from fide_crawler_spark.fixtures import calc_url, parse_page, render_page, synth_spans
from fide_crawler_spark.sources.fetcher import fetch_stage


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib naming)
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        if parsed.path == "/page":
            doc_id = qs["id"][0]
            body = render_page(doc_id).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif parsed.path == "/slow":
            time.sleep(3.0)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"too late")
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence per-request stderr lines
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _fetch(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r["url"]: r for r in fetch_stage(df, mode="http", **kw).collect()}


def test_http_spans_match_synthetic(spark, http_base):
    doc_ids = [calc_url(str(100 + i), "2023-01-01") for i in range(6)]
    by_url = _fetch(
        spark, [f"{http_base}/page?id={urllib.parse.quote(d)}" for d in doc_ids]
    )
    assert len(by_url) == len(doc_ids)
    for d in doc_ids:
        row = by_url[f"{http_base}/page?id={urllib.parse.quote(d)}"]
        assert row["status"] == "fetched"
        # byte-identical payload → identical parsed span sequence →
        # identical ground truth (kind, text, media_ref, offset)
        assert row["page"] == render_page(d)
        assert parse_page(row["page"]) == [
            (s.kind, s.text, s.media_ref, s.offset) for s in synth_spans(d)
        ]


def test_http_404_marks_failed_not_raises(spark, http_base):
    by_url = _fetch(spark, [f"{http_base}/nope"])
    row = by_url[f"{http_base}/nope"]
    assert row["status"] == "failed" and row["page"] == ""


def test_http_timeout_marks_failed(spark, http_base):
    t0 = time.time()
    by_url = _fetch(spark, [f"{http_base}/slow"], timeout=0.5)
    row = by_url[f"{http_base}/slow"]
    assert row["status"] == "failed" and row["page"] == ""
    # failed fast (the 0.5 s socket timeout), not after the 3 s sleep
    assert time.time() - t0 < 30


def test_http_mixed_batch_keeps_good_rows(spark, http_base):
    good = f"{http_base}/page?id=doc-x"
    bad = f"{http_base}/missing"
    by_url = _fetch(spark, [good, bad])
    assert by_url[good]["status"] == "fetched"
    assert by_url[good]["page"] == render_page("doc-x")
    assert by_url[bad]["status"] == "failed"
