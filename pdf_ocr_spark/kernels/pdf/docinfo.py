"""PDF document metadata and outline (bookmark) extraction — pure
COS-graph walks like :mod:`forms`, no content streams.

The outline tree is the document's own table of contents: at training-
data scale it drives section-aware chunking (split long documents on
bookmark boundaries instead of blind byte windows), and the /Info dict
carries title/author/date signals for quality filtering and dedup.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional

from pdf_ocr_spark.kernels.pdf.cos import PDFDocument, PDFError, Ref
from pdf_ocr_spark.kernels.pdf.forms import decode_text_string


class DocInfo(NamedTuple):
    title: Optional[str]
    author: Optional[str]
    subject: Optional[str]
    producer: Optional[str]
    created: Optional[str]   # raw PDF date string (D:YYYYMMDD…)
    modified: Optional[str]
    n_pages: int


class OutlineItem(NamedTuple):
    order: int    # document order, 0-based
    level: int    # 1 = top level
    title: str
    page_num: int  # 1-based target page, -1 when unresolvable


def _info_str(doc: PDFDocument, info: Dict[str, Any], key: str) -> Optional[str]:
    v = info.get(key)
    if v is None:
        return None
    try:
        s = decode_text_string(doc.resolve(v))
    except Exception:  # noqa: BLE001
        return None
    return s or None


def extract_doc_info(data: bytes) -> DocInfo:
    """bytes → :class:`DocInfo` from the trailer /Info dict (+ page
    count).  Deterministic, never raises."""
    empty = DocInfo(None, None, None, None, None, None, 0)
    try:
        doc = PDFDocument(data)
        n_pages = len(doc.pages())
    except PDFError:
        return empty
    except Exception:  # noqa: BLE001
        return empty
    info = doc.resolve(doc.trailer.get("Info"))
    if not isinstance(info, dict):
        return empty._replace(n_pages=n_pages)
    return DocInfo(
        title=_info_str(doc, info, "Title"),
        author=_info_str(doc, info, "Author"),
        subject=_info_str(doc, info, "Subject"),
        producer=_info_str(doc, info, "Producer"),
        created=_info_str(doc, info, "CreationDate"),
        modified=_info_str(doc, info, "ModDate"),
        n_pages=n_pages,
    )


def _page_ref_index(doc: PDFDocument) -> Dict[int, int]:
    """Map page object number → 1-based page index by walking the page
    tree REFS (the leaf dicts returned by ``doc.pages()`` are copies, so
    destinations must match on the reference, not identity)."""
    out: Dict[int, int] = {}
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        return out
    order = [0]
    seen: set = set()  # same cycle guard as cos.pages() — a cyclic
    #                    /Kids graph must not fan out exponentially

    def visit(ref: Any, depth: int) -> None:
        if depth > 64 or len(out) >= 50_000:
            return
        num = ref.num if isinstance(ref, Ref) else None
        try:
            node = doc.resolve(ref)
        except Exception:  # noqa: BLE001
            return
        if not isinstance(node, dict):
            return
        nid = id(node)
        if nid in seen:
            return
        seen.add(nid)
        if node.get("Type") == "Page" or (
            "Contents" in node and "Kids" not in node
        ):
            order[0] += 1
            if num is not None and num not in out:
                out[num] = order[0]
            return
        kids = doc.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for k in kids:
                visit(k, depth + 1)

    visit(root.get("Pages"), 0)
    return out


def _dest_page(doc: PDFDocument, item: Dict[str, Any], pmap: Dict[int, int]) -> int:
    dest = item.get("Dest")
    if dest is None:
        try:
            action = doc.resolve(item.get("A"))
        except Exception:  # noqa: BLE001
            action = None
        if isinstance(action, dict) and str(action.get("S", "")) == "GoTo":
            dest = action.get("D")
    try:
        dest = doc.resolve(dest)
    except Exception:  # noqa: BLE001
        return -1
    if isinstance(dest, list) and dest and isinstance(dest[0], Ref):
        return pmap.get(dest[0].num, -1)
    return -1


def extract_outline(data: bytes) -> List[OutlineItem]:
    """bytes → flattened outline items in document order (the /First →
    /Next sibling chains, depth-first).  Deterministic, never raises;
    cycles and depth bombs are bounded."""
    try:
        doc = PDFDocument(data)
        root = doc.resolve(doc.trailer.get("Root"))
    except PDFError:
        return []
    except Exception:  # noqa: BLE001
        return []
    if not isinstance(root, dict):
        return []
    try:
        outlines = doc.resolve(root.get("Outlines"))
    except Exception:  # noqa: BLE001
        return []
    if not isinstance(outlines, dict):
        return []
    pmap = _page_ref_index(doc)
    out: List[OutlineItem] = []
    seen: set = set()

    def walk(ref: Any, level: int) -> None:
        while ref is not None and len(out) < 4096 and level <= 32:
            key = ref.num if isinstance(ref, Ref) else id(ref)
            if key in seen:
                return
            seen.add(key)
            try:
                item = doc.resolve(ref)
            except Exception:  # noqa: BLE001
                return
            if not isinstance(item, dict):
                return
            title = ""
            if item.get("Title") is not None:
                try:
                    title = decode_text_string(doc.resolve(item["Title"]))
                except Exception:  # noqa: BLE001
                    title = ""
            out.append(
                OutlineItem(len(out), level, title, _dest_page(doc, item, pmap))
            )
            if item.get("First") is not None:
                walk(item["First"], level + 1)
            ref = item.get("Next")

    walk(outlines.get("First"), 1)
    return out


class Annotation(NamedTuple):
    page_num: int   # 1-based
    order: int      # per-document order, 0-based
    subtype: str    # Text | FreeText | Highlight | …
    contents: str   # decoded /Contents ('' when absent)
    author: str     # decoded /T ('' when absent)


_CONTENT_ANNOTS = {
    "Text", "FreeText", "Highlight", "Underline", "Squiggly",
    "StrikeOut", "Caret", "Ink", "Square", "Circle", "Polygon",
    "PolyLine", "Stamp", "Popup",
}


def extract_annotations(data: bytes) -> List[Annotation]:
    """bytes → markup/comment annotations with textual /Contents — the
    reviewer layer (sticky notes, highlights with comments) that never
    appears in the content stream.  Link and Widget annots are handled
    by their own extractors (frontier links, form fields) and skipped
    here.  Deterministic, never raises."""
    out: List[Annotation] = []
    try:
        doc = PDFDocument(data)
        pages = doc.pages()
    except PDFError:
        return []
    except Exception:  # noqa: BLE001
        return []
    for pno, page in enumerate(pages, 1):
        try:
            annots = doc.resolve(page.get("Annots"))
        except Exception:  # noqa: BLE001
            continue
        if not isinstance(annots, list):
            continue
        for a in annots[:256]:  # poison cap
            if len(out) >= 4096:
                return out
            try:
                ad = doc.resolve(a)
                if not isinstance(ad, dict):
                    continue
                subtype = str(ad.get("Subtype", ""))
                if subtype not in _CONTENT_ANNOTS:
                    continue
                contents = ""
                if ad.get("Contents") is not None:
                    contents = decode_text_string(doc.resolve(ad["Contents"]))
                author = ""
                if ad.get("T") is not None:
                    author = decode_text_string(doc.resolve(ad["T"]))
                if not contents and not author:
                    continue  # geometry-only markup carries no text
                out.append(Annotation(pno, len(out), subtype, contents, author))
            except Exception:  # noqa: BLE001
                continue
    return out
