"""Fuzz tests for the poison-row guarantee: whatever bytes a crawl
throws at them, the kernels must return a result object — never raise,
never hang.  (The Spark pipeline relies on this: a kernel exception
would only be caught per-document, but an uncaught MemoryError/hang in a
tight loop would still hurt the executor.)"""

from hypothesis import given, settings, strategies as st

from pdf_ocr_spark.fixtures.genpages import gen_rows
from pdf_ocr_spark.kernels.html_extract import extract_html
from pdf_ocr_spark.kernels.pdf.extract import DocExtract, count_pdf_pages, extract_pdf

_CORPUS = [bytes(r["html"]) for r in gen_rows(40)]
_PDFS = [d for d in _CORPUS if d[:5] == b"%PDF-"]


@settings(max_examples=60, deadline=2000, derandomize=True)
@given(st.binary(min_size=0, max_size=4096))
def test_extract_pdf_never_raises_on_random_bytes(data):
    res = extract_pdf(b"%PDF-" + data)
    assert isinstance(res, DocExtract)
    assert res.status in ("ok", "failed")


@settings(max_examples=60, deadline=2000, derandomize=True)
@given(st.binary(min_size=0, max_size=4096))
def test_extract_html_never_raises_on_random_bytes(data):
    text, status, reason = extract_html(data)
    assert status in ("ok", "failed")
    assert (status == "ok") == (text is not None and len(text) > 0) or status == "ok"


@settings(max_examples=80, deadline=5000, derandomize=True)
@given(
    st.integers(min_value=0, max_value=len(_PDFS) - 1),
    st.integers(min_value=0, max_value=3000),
    st.binary(min_size=1, max_size=64),
)
def test_mutated_real_pdfs_never_raise(idx, pos, junk):
    """Splice junk into real corpus PDFs at arbitrary offsets — xref
    offsets shift, streams corrupt, dict syntax breaks; the parser must
    degrade to status='failed' or partial text, never an exception."""
    base = _PDFS[idx]
    pos = min(pos, len(base) - 1)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    res = extract_pdf(mutated)
    assert isinstance(res, DocExtract)
    assert res.status in ("ok", "failed")
    assert count_pdf_pages(mutated) >= 0


@settings(max_examples=40, deadline=2000, derandomize=True)
@given(
    st.integers(min_value=0, max_value=len(_PDFS) - 1),
    st.integers(min_value=1, max_value=4000),
)
def test_truncated_real_pdfs_never_raise(idx, cut):
    base = _PDFS[idx]
    res = extract_pdf(base[: min(cut, len(base))])
    assert isinstance(res, DocExtract)


_SPECIALS = None  # lazily-built encrypted/LZW fixtures (expensive AES setup)


def _specials():
    global _SPECIALS
    if _SPECIALS is None:
        from tests.test_crypt import _aesv2_pdf, _aesv3_pdf, _rc4_pdf

        _SPECIALS = [_rc4_pdf(r=2, keybits=40), _rc4_pdf(), _aesv2_pdf(), _aesv3_pdf()]
    return _SPECIALS


@settings(max_examples=60, deadline=5000, derandomize=True)
@given(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=2000),
    st.binary(min_size=1, max_size=48),
)
def test_mutated_encrypted_pdfs_never_raise(idx, pos, junk):
    """Corrupting /Encrypt dicts, O/U entries, or ciphertext must yield a
    typed failure (or survive), never an exception — crypt.py is inside
    the kernel's no-raise promise."""
    base = _specials()[idx]
    pos = min(pos, len(base) - 1)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    res = extract_pdf(mutated)
    assert isinstance(res, DocExtract)
    assert res.status in ("ok", "failed")


@settings(max_examples=40, deadline=3000, derandomize=True)
@given(
    st.integers(min_value=0, max_value=2000),
    st.binary(min_size=1, max_size=48),
)
def test_mutated_lzw_pdfs_never_raise(pos, junk):
    """Corrupt LZW code streams (out-of-range codes, truncated bit
    runs) must fail typed, never raise."""
    from tests.test_cos import _lzw_encode

    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (LZW fuzz target) Tj ET"
    enc = _lzw_encode(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream"
        % (len(enc), enc),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
        len(objs) + 1, xref,
    )
    base = bytes(out)
    pos = min(pos, len(base) - 1)
    mutated = base[:pos] + junk + base[pos + len(junk):]
    res = extract_pdf(mutated)
    assert isinstance(res, DocExtract)
    assert res.status in ("ok", "failed")


def test_short_mediabox_never_raises():
    """Regression: a mutated /MediaBox with fewer than 4 numbers (or
    garbage) must fall back to a default page box, not IndexError
    (found by the deep mutation sweep)."""
    import re

    from pdf_ocr_spark.fixtures.genpages import make_simple_pdf

    base = make_simple_pdf([["hello mediabox"]])
    literal = re.search(rb"MediaBox *(\[[^\]]*\])", base).group(1)
    for bad in (b"[0 0 612]", b"[]", b"[0 0]", b"(notanarray)"):
        mutated = base.replace(literal, bad, 1)
        assert mutated != base
        res = extract_pdf(mutated)
        assert isinstance(res, DocExtract)
        # short/garbage boxes fall back to a default page, text survives
        assert res.status == "ok"
        assert "hello mediabox" in res.pages[0].text


@settings(max_examples=60, deadline=2000, derandomize=True)
@given(st.binary(min_size=0, max_size=4096))
def test_extract_metadata_never_raises_on_random_bytes(data):
    from pdf_ocr_spark.kernels.html_extract import HtmlMeta, extract_metadata

    m = extract_metadata(data)
    assert isinstance(m, HtmlMeta)
    for v in m:
        assert v is None or isinstance(v, str)


@settings(max_examples=40, deadline=2000, derandomize=True)
@given(st.text(max_size=200), st.text(max_size=200))
def test_extract_metadata_mutated_markup(title, content):
    """Arbitrary text spliced into real markup must parse without raising
    and never leak markup into the title."""
    from pdf_ocr_spark.kernels.html_extract import extract_metadata

    html = (
        f"<html><head><title>{title}</title>"
        f'<meta name="description" content="{content}">'
        f"</head><body></body></html>"
    ).encode("utf-8", "replace")
    m = extract_metadata(html)
    if m.title is not None:
        assert "<" not in m.title or ">" not in m.title or len(m.title) <= 300


@settings(max_examples=40, deadline=2000, derandomize=True)
@given(st.binary(min_size=0, max_size=4096))
def test_cos_walk_kernels_never_raise(data):
    """Forms / doc-info / outline / annotations are pure COS walks —
    whatever bytes arrive, they return, never raise."""
    from pdf_ocr_spark.kernels.pdf.docinfo import (
        extract_annotations,
        extract_doc_info,
        extract_outline,
    )
    from pdf_ocr_spark.kernels.pdf.forms import extract_form_fields

    blob = b"%PDF-" + data
    assert isinstance(extract_form_fields(blob), list)
    assert extract_doc_info(blob).n_pages >= 0
    assert isinstance(extract_outline(blob), list)
    assert isinstance(extract_annotations(blob), list)


@settings(max_examples=40, deadline=2000, derandomize=True)
@given(st.binary(min_size=0, max_size=2048))
def test_feed_and_sitemap_parsers_never_raise(data):
    from pdf_ocr_spark.kernels.robots import parse_feed, parse_sitemap_xml

    assert isinstance(parse_feed(data), list)
    assert isinstance(parse_sitemap_xml(data), list)
