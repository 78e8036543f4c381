"""Remote-VLM OCR client tests: a stdlib HTTP server plays the
OpenAI-compatible endpoint, verifying the full request/response protocol
(data-URI payload, message shape, auth header, token accounting, failure
semantics) and the end-to-end pipeline swap via SPARK_GRAFT_OCR_URL."""

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


class _FakeVlm(BaseHTTPRequestHandler):
    requests = []
    fail_next = False

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _FakeVlm.requests.append(
            {"path": self.path, "auth": self.headers.get("Authorization"), "body": body}
        )
        if _FakeVlm.fail_next:
            _FakeVlm.fail_next = False
            self.send_response(500)
            self.end_headers()
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
    srv = HTTPServer(("127.0.0.1", 0), _FakeVlm)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_protocol_and_token_accounting(vlm_server):
    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine

    _FakeVlm.requests.clear()
    eng = RemoteVlmEngine(vlm_server, api_key="sekrit", model="test-model", lang="zh")
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


def test_api_failure_yields_empty_not_exception(vlm_server):
    from pdf_ocr_spark.kernels.ocr_remote import RemoteVlmEngine

    eng = RemoteVlmEngine(vlm_server)
    _FakeVlm.fail_next = True
    out = eng.recognize_batch([b"X"])
    assert out == [[]]  # ref :230-232 — API failure is a result, not a raise


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
