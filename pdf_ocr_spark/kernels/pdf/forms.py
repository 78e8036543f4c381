"""AcroForm form-field extraction: walk /Root → /AcroForm → /Fields
(with /Kids recursion and partial-name composition) and decode each
terminal field's /T name and /V value.

Crawled PDFs carry real data in forms (applications, invoices,
government documents) that never appears in the content stream as
extractable text when the field has no appearance stream — a text-layer
pipeline that skips forms silently loses it.  Pure COS-graph traversal:
no content streams, no fonts; exercises the object layer (refs, object
streams, inheritance) on its own.

PDF text-string decoding per spec (ISO 32000-1 §7.9.2.2): a UTF-16BE
BOM wins, else PDFDocEncoding — which is latin-1 for every code point
that matters here; the handful of PDFDoc-specific mappings (bullets,
dashes at 0x18-0x1F/0x80-0x9F) are mapped explicitly.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple

from pdf_ocr_spark.kernels.pdf.cos import Name, PDFDocument, PDFError

# PDFDocEncoding positions that differ from latin-1 (ISO 32000-1 Annex D)
_PDFDOC_DIFF = {
    0x18: "˘", 0x19: "ˇ", 0x1A: "ˆ", 0x1B: "˙",
    0x1C: "˝", 0x1D: "˛", 0x1E: "˚", 0x1F: "˜",
    0x80: "•", 0x81: "†", 0x82: "‡", 0x83: "…",
    0x84: "—", 0x85: "–", 0x86: "ƒ", 0x87: "⁄",
    0x88: "‹", 0x89: "›", 0x8A: "−", 0x8B: "‰",
    0x8C: "„", 0x8D: "“", 0x8E: "”", 0x8F: "‘",
    0x90: "’", 0x91: "‚", 0x92: "™", 0x93: "ﬁ",
    0x94: "ﬂ", 0x95: "Ł", 0x96: "Œ", 0x97: "Š",
    0x98: "Ÿ", 0x99: "Ž", 0x9A: "ı", 0x9B: "ł",
    0x9C: "œ", 0x9D: "š", 0x9E: "ž",
}


def decode_text_string(raw: Any) -> str:
    """PDF text string → unicode: UTF-16BE with BOM, else PDFDoc."""
    if isinstance(raw, Name):
        return str(raw)
    if isinstance(raw, str):
        return raw
    if not isinstance(raw, bytes):
        return "" if raw is None else str(raw)
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return "".join(_PDFDOC_DIFF.get(b, chr(b)) for b in raw)


class FormField(NamedTuple):
    name: str        # fully-qualified (parent.child) field name
    field_type: str  # Tx | Btn | Ch | Sig | '' when inherited/absent
    value: str       # decoded /V ('' when unset)


def extract_form_fields(data: bytes) -> List[FormField]:
    """bytes → terminal AcroForm fields in document order.

    /Kids recursion composes fully-qualified names with '.' (§12.7.3.2);
    /FT and /V inherit down the tree; a node is terminal when it has no
    /Kids with their own /T (widget-only kids collapse into the parent).
    Deterministic, never raises — malformed forms yield what was
    walkable."""
    out: List[FormField] = []
    try:
        doc = PDFDocument(data)
        root = doc.resolve(doc.trailer.get("Root")) or {}
        acro = doc.resolve(root.get("AcroForm"))
        if not isinstance(acro, dict):
            return []
        fields = doc.resolve(acro.get("Fields"))
        if not isinstance(fields, list):
            return []
    except PDFError:
        return []
    except Exception:  # noqa: BLE001 — crawled bytes
        return []

    def walk(node_ref: Any, prefix: str, ft: str, val: str, depth: int) -> None:
        if depth > 16 or len(out) >= 4096:
            return
        try:
            node = doc.resolve(node_ref)
        except Exception:  # noqa: BLE001
            return
        if not isinstance(node, dict):
            return
        t = node.get("T")
        name = prefix
        if t is not None:
            part = decode_text_string(doc.resolve(t))
            name = f"{prefix}.{part}" if prefix else part
        if "FT" in node:
            ft = str(doc.resolve(node.get("FT")) or "")
        if "V" in node:
            try:
                val = decode_text_string(doc.resolve(node.get("V")))
            except Exception:  # noqa: BLE001
                val = ""
        kids = doc.resolve(node.get("Kids"))
        named_kids = []
        if isinstance(kids, list):
            for k in kids:
                try:
                    kd = doc.resolve(k)
                except Exception:  # noqa: BLE001
                    continue
                if isinstance(kd, dict) and kd.get("T") is not None:
                    named_kids.append(k)
        if named_kids:
            for k in named_kids:
                walk(k, name, ft, val, depth + 1)
        elif name:
            out.append(FormField(name, ft, val))

    for f in fields:
        walk(f, "", "", "", 0)
    return out
