"""Unit tests for the readability-style boilerplate stripper (K5)."""

from pdf_ocr_spark.kernels.html_extract import extract_html


BOILERPLATE_PAGE = b"""<!DOCTYPE html><html><head><title>T</title>
<script>var x = "<p>not text</p>";</script><style>.a{color:red}</style></head>
<body>
<nav><a href=a>Home</a> <a href=b>About</a> <a href=c>Contact</a></nav>
<div id=main><article><h2>Headline</h2>
<p>First paragraph of the body, long enough to score, with commas, plenty.</p>
<p>Second paragraph continues the main content with more words to weigh.</p>
</article></div>
<aside><a href=x>Ad one</a> <a href=y>Ad two</a></aside>
<footer>Copyright <a href=z>legal</a></footer>
</body></html>"""


def test_strips_boilerplate():
    text, status, reason = extract_html(BOILERPLATE_PAGE)
    assert status == "ok"
    assert "First paragraph" in text
    assert "Second paragraph" in text
    assert "Headline" in text
    assert "Home" not in text       # nav dropped
    assert "Ad one" not in text     # aside dropped
    assert "Copyright" not in text  # footer dropped
    assert "not text" not in text   # script content never leaks


def test_entities_decoded():
    html = b"<div><p>" + "A &amp; B &mdash; caf&eacute; &#x2603; snow".encode() + b" with enough following words to pass the length gate, clearly.</p></div>"
    text, status, _ = extract_html(html)
    assert status == "ok"
    assert "A & B — café ☃ snow" in text


def test_block_elements_get_newlines():
    html = (
        b"<div><p>Paragraph one is long enough to be the article content here.</p>"
        b"<p>Paragraph two is also long enough to be counted as content.</p></div>"
    )
    text, status, _ = extract_html(html)
    assert status == "ok"
    assert text.count("\n") == 1


def test_inline_elements_flow():
    html = (
        b"<div><p>Inline <b>bold</b> and <i>italic</i> text should flow together"
        b" in one single line with no breaks at all, naturally.</p></div>"
    )
    text, status, _ = extract_html(html)
    assert status == "ok"
    assert "Inline bold and italic text" in text
    assert "\n" not in text


def test_empty_and_garbage():
    assert extract_html(b"")[1] == "failed"
    assert extract_html(b"\x00\x01\x02binary junk")[1] == "failed"


def test_malformed_html_tolerated():
    html = b"<div><p>Unclosed paragraph with enough text to be chosen as main content, truly." \
           b"<p>Another unclosed one follows with even more words to weigh in."
    text, status, _ = extract_html(html)
    assert status == "ok"
    assert "Unclosed paragraph" in text


def test_deterministic():
    a = extract_html(BOILERPLATE_PAGE)
    b = extract_html(BOILERPLATE_PAGE)
    assert a == b


def test_charset_fallback_latin1():
    html = "<div><p>Accented caf\xe9 text that is long enough to be main content, obviously.</p></div>".encode("latin-1")
    text, status, _ = extract_html(html)
    assert status == "ok"
    assert "café" in text
