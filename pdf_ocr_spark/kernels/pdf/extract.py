"""Top-level PDF extraction: bytes → per-page blocks/text + OCR-branch
classification.

Semantics reproduced from the reference:
  * page text = block texts joined '\\n'
    (/root/reference/pdf_ocr_with_boxes_v2.py:684-686)
  * document text = concatenation of '# 第 {i} 页\\n\\n{page_text}\\n\\n'
    chunks, exactly as v2 builds ``all_texts`` and ``writelines`` them
    (/root/reference/pdf_ocr_with_boxes_v2.py:697,715-718)
  * txt-vs-ocr classification per document, the ``ds.classify()`` decision
    (/root/reference/pdf_ocr_with_boxes_v3.py:118-128): a page with no
    text-show operators but drawn images needs OCR
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

from pdf_ocr_spark.kernels.pdf.content import (
    dominant_rotation,
    interpret_page,
    normalize_page_rotation,
)
from pdf_ocr_spark.kernels.pdf.cos import PDFDocument, PDFError
from pdf_ocr_spark.kernels.pdf.crypt import PDFEncryptedError
from pdf_ocr_spark.kernels.pdf.raster import rasterize_page
from pdf_ocr_spark.kernels.pdf.layout import (
    Block,
    attach_captions,
    borderless_table_regions,
    build_blocks,
    build_lines,
    image_blocks,
    page_text_from_blocks,
    retype_table_blocks,
    table_regions,
    xy_cut_order,
)

MAX_PAGES = 10_000  # poison-doc cap: a 100k-page PDF must not wedge an executor


class PageExtract(NamedTuple):
    page_num: int           # 1-based
    text: str               # '' when needs_ocr
    n_blocks: int
    needs_ocr: bool
    ocr_payload: Optional[bytes]  # first image XObject bytes, for the OCR stage
    width: float
    height: float


class DocExtract(NamedTuple):
    status: str              # 'ok' | 'failed'
    failure_reason: Optional[str]
    n_pages: int
    pages: List[PageExtract]
    blocks: List[Block]
    links: Tuple[str, ...] = ()  # /Annots Link URIs, document order, deduped


def count_pdf_pages(pdf_bytes: bytes) -> int:
    """Cheap structural pass: xref + page-tree walk only, no content
    decode.  Returns 0 on malformed input.  Used to plan page-range
    splits for giant documents (SURVEY.md §4.1 straggler mitigation)."""
    try:
        return min(len(PDFDocument(pdf_bytes).pages()), MAX_PAGES)
    except Exception:  # noqa: BLE001 — structural pass never raises
        return 0


def extract_pdf(
    pdf_bytes: bytes,
    page_lo: int = 1,
    page_hi: Optional[int] = None,
) -> DocExtract:
    """Parse one PDF and extract per-page text blocks.

    ``page_lo``/``page_hi`` (1-based, inclusive) restrict extraction to a
    page range while keeping GLOBAL page numbers — the unit of work for
    splitting giant documents across tasks; the default covers the whole
    document.

    Never raises on malformed input: structural failures return
    status='failed' with a reason class, so the Spark batch keeps going
    (poison-row isolation, SURVEY.md §4.1)."""
    try:
        # encrypted docs: PDFDocument transparently decrypts the common
        # owner-password-only case (empty user password, RC4-40/128 or
        # AES-128/256 — kernels/pdf/crypt.py); only a REAL user password
        # or an unsupported handler surfaces as the typed failure below
        doc = PDFDocument(pdf_bytes)
        page_dicts = doc.pages()
    except PDFEncryptedError:
        return DocExtract("failed", "pdf_encrypted", 0, [], [])
    except PDFError as e:
        return DocExtract("failed", f"pdf_parse_error: {e}", 0, [], [])
    except Exception as e:  # noqa: BLE001 — the no-raise promise is absolute
        return DocExtract("failed", f"pdf_parse_error: {type(e).__name__}", 0, [], [])
    if not page_dicts:
        return DocExtract("failed", "pdf_no_pages", 0, [], [])

    page_dicts = page_dicts[:MAX_PAGES]
    lo = max(1, page_lo)
    hi = len(page_dicts) if page_hi is None else min(page_hi, len(page_dicts))
    pages: List[PageExtract] = []
    blocks: List[Block] = []
    links: List[str] = []
    seen_links: set = set()
    for i, pd in enumerate(page_dicts[lo - 1 : hi], lo):
        for u in _page_link_uris(doc, pd):
            if u not in seen_links:
                seen_links.add(u)
                links.append(u)
        try:
            res = interpret_page(doc, pd)
            # K4 OSD (content-based): pages whose glyphs flow sideways
            # WITHOUT a /Rotate attribute (producer baked the rotation
            # into text matrices) get their geometry re-oriented before
            # layout, like the reference rotates scans by the Tesseract
            # OSD angle before OCR (parse_student_answers.py:40-66)
            rot = dominant_rotation(res.rot_votes)
            if rot:
                res = normalize_page_rotation(res, rot)
        except Exception:  # noqa: BLE001 — a mangled page must not raise
            pages.append(PageExtract(i, "", 0, False, None, 0.0, 0.0))
            continue
        has_text = any(g.text.strip() for g in res.glyphs)
        if not has_text and res.images:
            # image-only page → OCR branch (P8 classification)
            pages.append(
                PageExtract(i, "", 0, True, res.images[0], res.width, res.height)
            )
            continue
        if not has_text and res.rules:
            # VECTOR-ONLY text-less page (line-art, chart, re-drawn scan):
            # the reference rasterizes every page before OCR
            # (pdf_to_images, /root/reference/pdf_ocr_with_boxes_v3.py:144-158)
            # so these pages still reach recognition; we rasterize the
            # recorded geometry from scratch (kernels/pdf/raster.py) and
            # route the bitmap down the same OCR branch.  Truly blank
            # pages (no ink at all) stay ordinary empty-text pages.
            payload = rasterize_page(
                res.glyphs, res.rules, res.image_draws, res.width, res.height
            )
            pages.append(PageExtract(i, "", 0, True, payload, res.width, res.height))
            continue
        lines = build_lines(res.glyphs, res.height)
        ordered = xy_cut_order(lines)
        pblocks = build_blocks(ordered, i)
        regions = table_regions(res.rules, res.height) if res.rules else []
        # whitespace-aligned (borderless) tables: keep only detections
        # whose center is outside every ruled grid — ruled cells align
        # too, and the grid already claims them
        for bx0, by0, bx1, by1 in borderless_table_regions(lines):
            cx, cy = (bx0 + bx1) / 2.0, (by0 + by1) / 2.0
            if not any(rx0 <= cx <= rx1 and ry0 <= cy <= ry1
                       for rx0, ry0, rx1, ry1 in regions):
                regions.append((bx0, by0, bx1, by1))
        if regions:  # ruled grids + borderless runs → 'table' blocks (v4)
            pblocks = retype_table_blocks(pblocks, regions)
        # page text comes from the TEXT-layout blocks only, BEFORE image
        # blocks / caption retyping — 'image' blocks carry empty text and
        # caption typing changes only the type field, so extracted text
        # stays byte-identical to the v2/v3 reference output
        text = page_text_from_blocks(pblocks)
        if res.image_draws:
            pblocks = pblocks + image_blocks(
                res.image_draws, res.height, i, len(pblocks)
            )
        if regions or res.image_draws:
            pblocks = attach_captions(pblocks, regions)
        blocks.extend(pblocks)
        pages.append(
            PageExtract(
                i,
                text,
                len(pblocks),
                False,
                None,
                res.width,
                res.height,
            )
        )
    return DocExtract("ok", None, len(pages), pages, blocks, tuple(links))


def _page_link_uris(doc: PDFDocument, page: dict) -> List[str]:
    """Link-annotation URIs of one page (/Annots → /Subtype /Link →
    /A /S /URI) — PDF hyperlinks feed the crawl frontier like HTML
    anchors do.  Tolerant: malformed annots are skipped."""
    out: List[str] = []
    try:
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            return out
        for a in annots[:256]:  # poison cap
            ad = doc.resolve(a)
            if not isinstance(ad, dict) or str(ad.get("Subtype", "")) != "Link":
                continue
            action = doc.resolve(ad.get("A"))
            if not isinstance(action, dict) or str(action.get("S", "")) != "URI":
                continue
            uri = doc.resolve(action.get("URI"))
            if isinstance(uri, bytes):
                out.append(uri.decode("utf-8", "replace"))
    except Exception:  # noqa: BLE001 — never fail a page over its annots
        return out
    return out


def page_header(page_num: int, text: str) -> str:
    """v2's per-page chunk: ``f"# 第 {i} 页\\n\\n{cleaned_text}\\n\\n"``
    (/root/reference/pdf_ocr_with_boxes_v2.py:697)."""
    return f"# 第 {page_num} 页\n\n{text}\n\n"


def assemble_doc_text(page_texts: List[str]) -> str:
    """Document text = concatenated page chunks, v2's ``writelines``
    (/root/reference/pdf_ocr_with_boxes_v2.py:715-718)."""
    return "".join(page_header(i, t) for i, t in enumerate(page_texts, 1))
