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


# ---------------------------------------------------------------------------
# recorded-response conformance (real-endpoint response variants)
# ---------------------------------------------------------------------------

# Verbatim response-body shapes as real OpenAI-compatible OCR endpoints
# serve them (vLLM, SiliconFlow, DeepSeek-style reasoners).  The client
# must lift message.content from every envelope, and the layout parse
# must survive every fence dialect the reference survives
# (/root/reference/pdf_ocr_with_silicon_remote_vllm.py:317-334).
RECORDED_RESPONSES = {
    "vllm_json_fence": {
        "id": "chatcmpl-8f2f6b0f3a9c4d1e",
        "object": "chat.completion",
        "created": 1735689600,
        "model": "Qwen/Qwen2-VL-7B-Instruct",
        "choices": [{
            "index": 0,
            "message": {
                "role": "assistant",
                "content": "以下是版面分析结果：\n```json\n[{\"category\": \"text\","
                           " \"bbox\": [10, 20, 300, 48], \"text\": \"第一段\"}]\n```"
                           "\n注意：输出为原始文本。",
            },
            "logprobs": None,
            "finish_reason": "stop",
        }],
        "usage": {"prompt_tokens": 1201, "total_tokens": 1289,
                  "completion_tokens": 88},
    },
    "siliconflow_bare_fence": {
        "id": "0194e7a2c8b64f0e8a3d",
        "object": "chat.completion",
        "created": 1735689601,
        "model": "deepseek-ai/deepseek-vl2",
        "system_fingerprint": "",
        "choices": [{
            "index": 0,
            "message": {
                "role": "assistant",
                "content": "```\n[{\"category\": \"table\", \"bbox\":"
                           " [0, 0, 100, 50], \"text\": \"表格\"}]\n```",
            },
            "finish_reason": "stop",
        }],
        "usage": {"prompt_tokens": 940, "completion_tokens": 41,
                  "total_tokens": 981,
                  "completion_tokens_details": {"reasoning_tokens": 0}},
    },
    "reasoner_raw_json": {
        "id": "chatcmpl-aa11",
        "object": "chat.completion",
        "created": 1735689602,
        "model": "deepseek-reasoner",
        "choices": [{
            "index": 0,
            "message": {
                "role": "assistant",
                "reasoning_content": "The page contains one text block…",
                "content": "[{\"category\": \"text\", \"bbox\":"
                           " [5, 5, 80, 20], \"text\": \"plain\"}]",
            },
            "finish_reason": "stop",
        }],
        "usage": {"prompt_tokens": 700, "completion_tokens": 120,
                  "total_tokens": 820},
    },
    "malformed_fence_payload": {
        "id": "chatcmpl-bb22",
        "object": "chat.completion",
        "created": 1735689603,
        "model": "Qwen/Qwen2-VL-7B-Instruct",
        "choices": [{
            "index": 0,
            "message": {
                "role": "assistant",
                "content": "```json\n[{\"category\": \"text\", \"bbox\":"
                           " [1, 2, 3, 4], \"text\": \"oops\",}]\n```",
            },
            "finish_reason": "length",
        }],
        "usage": {"prompt_tokens": 650, "completion_tokens": 2048,
                  "total_tokens": 2698},
    },
}


class _CannedVlm(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    queue = []                       # response dicts served in order

    def do_POST(self):  # noqa: N802
        self.rfile.read(int(self.headers["Content-Length"]))
        payload = json.dumps(_CannedVlm.queue.pop(0)).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def canned_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CannedVlm)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_recorded_variants_content_and_usage(canned_server):
    """The client lifts message.content verbatim from every recorded
    envelope shape (extra fields like reasoning_content,
    system_fingerprint, completion_tokens_details are ignored) and sums
    usage across the batch."""
    names = ["vllm_json_fence", "siliconflow_bare_fence",
             "reasoner_raw_json", "malformed_fence_payload"]
    _CannedVlm.queue = [RECORDED_RESPONSES[n] for n in names]
    eng = _engine(canned_server)
    out = eng.recognize_batch([b"x"] * len(names))
    assert len(out) == 4 and all(o is not None for o in out)
    # line split of the exact content, blanks dropped, confidence 1.0
    assert out[0][0] == ("以下是版面分析结果：", 1.0)
    assert out[0][1][0].startswith("```json")
    assert eng.prompt_tokens == 1201 + 940 + 700 + 650
    assert eng.completion_tokens == 88 + 41 + 120 + 2048


def test_parse_layout_response_fence_dialects():
    """parse_layout_response reproduces the reference's 3-way fallback
    on every recorded content variant."""
    from pdf_ocr_spark.kernels.ocr_remote import parse_layout_response

    def content(name):
        return RECORDED_RESPONSES[name]["choices"][0]["message"]["content"]

    r = parse_layout_response(content("vllm_json_fence"))
    assert r["layout"] == [{"category": "text", "bbox": [10, 20, 300, 48],
                            "text": "第一段"}]
    assert r["raw_response"].startswith("以下是")

    r = parse_layout_response(content("siliconflow_bare_fence"))
    assert r["layout"][0]["category"] == "table"

    r = parse_layout_response(content("reasoner_raw_json"))
    assert r["layout"][0]["text"] == "plain"

    r = parse_layout_response(content("malformed_fence_payload"))
    assert "error" in r and r["text"] == content("malformed_fence_payload")


def test_parse_layout_response_reference_quirks():
    """Edge fidelity with the reference slicer: an UNTERMINATED fence
    slices to find('```', start) == -1, i.e. drops the final character
    (reference line 321/325 behavior) — the payload then fails to parse
    and falls into the error branch instead of raising."""
    from pdf_ocr_spark.kernels.ocr_remote import parse_layout_response

    r = parse_layout_response('```json\n{"a": 1}')
    assert "error" in r and r["text"] == '```json\n{"a": 1}'
    # fence containing the ```json marker wins over a bare ``` earlier on
    r = parse_layout_response('``` ignored ``` ```json{"a": 1}```')
    assert r == {"layout": {"a": 1},
                 "raw_response": '``` ignored ``` ```json{"a": 1}```'}
    # whitespace-only / empty responses -> error branch, never a raise
    assert "error" in parse_layout_response("")
    assert "error" in parse_layout_response("   \n  ")
