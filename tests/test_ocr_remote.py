"""Remote-VLM OCR client tests: a stdlib HTTP server plays the
OpenAI-compatible endpoint, verifying the full request/response protocol
(data-URI payload, message shape, auth header, token accounting, retry +
failure semantics, keep-alive) and the end-to-end pipeline swap via
SPARK_GRAFT_OCR_URL."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class _FakeVlm(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"  # keep-alive, like a real endpoint
    requests = []
    fail_count = 0       # fail this many requests with 500, then succeed
    fail_status = 500
    malformed_200 = 0    # serve this many 200s with usage but NO choices

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _FakeVlm.requests.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "body": body,
                "client_port": self.client_address[1],  # TCP conn identity
            }
        )
        if _FakeVlm.fail_count > 0:
            _FakeVlm.fail_count -= 1
            self.send_response(_FakeVlm.fail_status)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if _FakeVlm.malformed_200 > 0:
            _FakeVlm.malformed_200 -= 1
            payload = json.dumps(
                {"error": "filtered", "usage": {"prompt_tokens": 1000,
                                                "completion_tokens": 0}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
            return
        # echo the decoded image payload back as the "recognized" text
        uri = body["messages"][0]["content"][0]["image_url"]["url"]
        b64 = uri.split("base64,", 1)[1]
        text = base64.b64decode(b64).decode("utf-8", "replace")
        resp = {
            "choices": [{"message": {"content": f"line one of {text}\nline two"}}],
            "usage": {"prompt_tokens": 11, "completion_tokens": 7, "total_tokens": 18},
        }
        payload = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def vlm_server():
    # Threading: keep-alive clients hold their connection open; a serial
    # server would block every later connection behind the first engine's
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeVlm)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def _engine(url, **kw):
    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine

    eng = RemoteVlmEngine(url, **kw)
    eng._sleep = lambda s: None  # no real backoff waits in tests
    return eng


def test_protocol_and_token_accounting(vlm_server):
    _FakeVlm.requests.clear()
    _FakeVlm.fail_count = 0
    eng = _engine(vlm_server, api_key="sekrit", model="test-model", lang="zh")
    out = eng.recognize_batch([b"IMGDATA-1", None, b"IMGDATA-2"])
    assert len(out) == 3
    assert out[0] == [("line one of IMGDATA-1", 1.0), ("line two", 1.0)]
    assert out[1] == []  # empty payload → no call, empty result
    assert out[2][0][0] == "line one of IMGDATA-2"

    assert len(_FakeVlm.requests) == 2
    r = _FakeVlm.requests[0]
    assert r["path"].endswith("/chat/completions")
    assert r["auth"] == "Bearer sekrit"
    assert r["body"]["model"] == "test-model"
    content = r["body"]["messages"][0]["content"]
    assert content[0]["type"] == "image_url"
    assert content[0]["image_url"]["url"].startswith("data:image/png;base64,")
    assert content[1]["text"].startswith("提取")  # zh prompt (F14)
    # A7: usage summed across calls
    assert eng.prompt_tokens == 22 and eng.completion_tokens == 14
    # keep-alive: both pages flowed over ONE TCP connection
    assert r["client_port"] == _FakeVlm.requests[1]["client_port"]


def test_transient_failure_retried(vlm_server):
    """One 500 then success: the page must NOT silently come back empty —
    bounded retries recover it (a checkpointed pipeline commits results;
    an unretried transient error would be permanent data loss)."""
    _FakeVlm.requests.clear()
    _FakeVlm.fail_count = 1
    eng = _engine(vlm_server)
    out = eng.recognize_batch([b"RETRYME"])
    assert out == [[("line one of RETRYME", 1.0), ("line two", 1.0)]]
    assert len(_FakeVlm.requests) == 2  # the failed attempt + the retry


def test_exhausted_retries_yield_failure_marker(vlm_server):
    """All attempts 500 → the page result is None (OCR-FAILED marker),
    distinct from [] (blank page) — and never an exception."""
    _FakeVlm.requests.clear()
    _FakeVlm.fail_count = 99
    eng = _engine(vlm_server, max_attempts=3)
    out = eng.recognize_batch([b"X"])
    assert out == [None]
    assert len(_FakeVlm.requests) == 3  # bounded: exactly max_attempts
    _FakeVlm.fail_count = 0


def test_malformed_200_does_not_inflate_usage(vlm_server):
    """A 200 carrying usage but no choices is retried — its token counts
    must NOT accumulate once per attempt (A7 accounting integrity)."""
    _FakeVlm.requests.clear()
    _FakeVlm.malformed_200 = 99
    try:
        eng = _engine(vlm_server, max_attempts=3)
        out = eng.recognize_batch([b"X"])
        assert out == [None]
        assert eng.prompt_tokens == 0  # never counted, despite 3 attempts
    finally:
        _FakeVlm.malformed_200 = 0


def test_definitive_4xx_fails_fast(vlm_server):
    """A 401 is not retryable — one attempt, failure marker."""
    _FakeVlm.requests.clear()
    _FakeVlm.fail_count = 99
    _FakeVlm.fail_status = 401
    try:
        eng = _engine(vlm_server, max_attempts=3)
        out = eng.recognize_batch([b"X"])
        assert out == [None]
        assert len(_FakeVlm.requests) == 1
    finally:
        _FakeVlm.fail_count = 0
        _FakeVlm.fail_status = 500


def test_ocr_failure_surfaces_as_typed_doc_failure(vlm_server, monkeypatch):
    """Pipeline contract: an OCR-failed page makes the DOCUMENT a typed
    'ocr_failed' failure (resume retries it) — never an ok doc with
    silently-empty text."""
    import pandas as pd

    import pdf_ocr_spark.kernels.ocr_stub as stub
    from pdf_ocr_spark.fixtures.genpages import make_scan_pdf
    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine
    from pdf_ocr_spark.pipeline.extract_job import (
        OCR_FAILED_REASON,
        extract_docs_batch,
    )

    monkeypatch.setenv("SPARK_GRAFT_OCR_URL", vlm_server)
    monkeypatch.setattr(stub, "_ENGINE", None)  # force lazy re-init
    orig_init = RemoteVlmEngine.__init__

    def fast_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._sleep = lambda s: None

    monkeypatch.setattr(RemoteVlmEngine, "__init__", fast_init)
    try:
        _FakeVlm.fail_count = 99
        pdf = make_scan_pdf(["unreachable text"])
        batch = pd.DataFrame({"url": ["u://scan"], "html": [pdf]})
        out = pd.concat(list(extract_docs_batch(iter([batch]))))
        row = out.iloc[0]
        assert row["status"] == "failed"
        assert row["failure_reason"] == OCR_FAILED_REASON
        assert row["extracted_text"] is None
    finally:
        _FakeVlm.fail_count = 0
        monkeypatch.setattr(stub, "_ENGINE", None)


def test_ocr_batch_paged_route_marks_failure(vlm_server, monkeypatch):
    """The page-level route too: an OCR-failed page row becomes
    status='failed' with the typed reason, not a silently-blank page."""
    import pandas as pd

    import pdf_ocr_spark.kernels.ocr_stub as stub
    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine
    from pdf_ocr_spark.pipeline.extract_job import (
        OCR_FAILED_REASON,
        PAGE_SCHEMA,
        ocr_batch,
    )

    monkeypatch.setenv("SPARK_GRAFT_OCR_URL", vlm_server)
    monkeypatch.setattr(stub, "_ENGINE", None)
    orig_init = RemoteVlmEngine.__init__

    def fast_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._sleep = lambda s: None

    monkeypatch.setattr(RemoteVlmEngine, "__init__", fast_init)
    try:
        _FakeVlm.fail_count = 99
        cols = [f.name for f in PAGE_SCHEMA.fields]
        batch = pd.DataFrame(
            [
                ("u://a", "pdf", 1, None, 0, True, b"IMG", "ok", None, 10),
                ("u://a", "pdf", 2, "text page", 3, False, None, "ok", None, 10),
            ],
            columns=cols,
        )
        out = pd.concat(list(ocr_batch(iter([batch]))))
        failed = out[out["page"] == 1].iloc[0]
        assert failed["status"] == "failed"
        assert failed["failure_reason"] == OCR_FAILED_REASON
        assert out[out["page"] == 2].iloc[0]["status"] == "ok"
    finally:
        _FakeVlm.fail_count = 0
        monkeypatch.setattr(stub, "_ENGINE", None)


def test_resume_retries_transient_ocr_failures(spark):
    """resume_filter: committed 'ocr_failed' rows do NOT count as done
    (reprocessed next run); permanent parse failures stay committed."""
    from pdf_ocr_spark.pipeline.extract_job import OCR_FAILED_REASON, resume_filter

    inp = spark.createDataFrame(
        [("u://a",), ("u://b",), ("u://c",), ("u://d",)], "url string"
    )
    done = spark.createDataFrame(
        [
            ("u://a", "ok", None),
            ("u://b", "failed", "pdf_parse_error: no xref"),  # permanent
            ("u://c", "failed", OCR_FAILED_REASON),           # transient
        ],
        "url string, status string, failure_reason string",
    )
    remaining = {r["url"] for r in resume_filter(inp, done).collect()}
    assert remaining == {"u://c", "u://d"}
    # opt-out keeps the old strict semantics
    strict = {r["url"] for r in resume_filter(inp, done, retry_transient=False).collect()}
    assert strict == {"u://d"}


def test_pipeline_env_swap(vlm_server, monkeypatch):
    """With SPARK_GRAFT_OCR_URL set, the fused extractor UDF body routes
    scan-PDF pages to the remote engine instead of the stub.  Driven by
    calling ``extract_docs_batch`` exactly as the executor does (env vars
    cannot reach ALREADY-RUNNING reused python workers mid-session — on a
    cluster the variable ships via spark.executorEnv at submit time)."""
    import pandas as pd

    import pdf_ocr_spark.kernels.ocr_stub as stub
    from pdf_ocr_spark.fixtures.genpages import make_scan_pdf
    from pdf_ocr_spark.pipeline.extract_job import extract_docs_batch

    monkeypatch.setenv("SPARK_GRAFT_OCR_URL", vlm_server)
    monkeypatch.setattr(stub, "_ENGINE", None)  # force lazy re-init
    try:
        _FakeVlm.fail_count = 0
        pdf = make_scan_pdf(["remote ocr target"])
        batch = pd.DataFrame({"url": ["u://scan"], "html": [pdf]})
        out = pd.concat(list(extract_docs_batch(iter([batch]))))
        row = out.iloc[0]
        assert row["status"] == "ok"
        assert "line one of" in row["extracted_text"]  # remote engine ran
        assert "line two" in row["extracted_text"]
        assert row["n_ocr_pages"] == 1
    finally:
        monkeypatch.setattr(stub, "_ENGINE", None)


# ---------------------------------------------------------------------------
# Live-endpoint smoke test (env-gated; skipped in the sandbox)
# ---------------------------------------------------------------------------


def _tiny_png(size: int = 24) -> bytes:
    """A real, decodable grayscale PNG (stdlib zlib/struct only): white
    field with a black plus sign — enough for a VLM to accept the image
    payload.  The fixture exists so the live smoke test sends an actual
    image, not the byte-layout stand-ins the fake server echoes."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    mid, arm = size // 2, size // 4
    raw = b""
    for y in range(size):
        row = bytearray([255] * size)
        for x in range(size):
            on_bar = abs(x - mid) <= 1 and arm <= y < size - arm
            on_cross = abs(y - mid) <= 1 and arm <= x < size - arm
            if on_bar or on_cross:
                row[x] = 0
        raw += b"\x00" + bytes(row)  # filter type 0 per scanline
    ihdr = struct.pack(">IIBBBBB", size, size, 8, 0, 0, 0, 0)  # 8-bit gray
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_OCR_LIVE_URL"),
    reason="SPARK_GRAFT_OCR_LIVE_URL not set — live OCR smoke test is opt-in",
)
def test_live_endpoint_smoke():
    """One real page through RemoteVlmEngine against a live OpenAI-
    compatible endpoint (vLLM/SiliconFlow).  Opt-in: export
    SPARK_GRAFT_OCR_LIVE_URL (plus SPARK_GRAFT_OCR_KEY / _MODEL as the
    endpoint requires) and run this test directly.  Asserts only the
    round-trip contract — a non-None result (the request protocol,
    auth, and response parsing all worked) and usage accounting — not
    any particular recognized text: a 24px plus sign may legitimately
    OCR to nothing."""
    import os

    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine

    eng = RemoteVlmEngine(
        os.environ["SPARK_GRAFT_OCR_LIVE_URL"],
        api_key=os.environ.get("SPARK_GRAFT_OCR_KEY", ""),
        model=os.environ.get(
            "SPARK_GRAFT_OCR_MODEL", "Qwen/Qwen3-VL-32B-Instruct"
        ),
    )
    (result,) = eng.recognize_batch([_tiny_png()])
    assert result is not None, "live OCR round-trip failed after retries"
    assert all(isinstance(t, str) and c == 1.0 for t, c in result)
    assert eng.prompt_tokens > 0  # A7 accounting engaged on the live reply
