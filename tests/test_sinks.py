"""Visualization sinks (S7 SVG overlay, S9 double-layer PDF): determinism,
reference drawing semantics, and the round-trip property — the invisible
text layer written by our sink parses back through our own extractor."""

from pdf_ocr_spark.operators.sinks import (
    COLORS,
    double_layer_pdf,
    overlay_svg,
)


BOXES = [
    ("hello world this is long", [[10, 20], [110, 20], [110, 40], [10, 40]]),
    ("b<&d", [[10, 60], [80, 60], [80, 80], [10, 80]]),
    ("bad", [[0, 0]]),  # invalid quad → skipped (P5)
]


def test_overlay_svg_semantics():
    svg = overlay_svg(612, 792, BOXES)
    assert svg == overlay_svg(612, 792, BOXES)  # deterministic
    assert svg.count("<polygon") == 2  # invalid quad skipped
    assert COLORS[0] in svg and COLORS[1] in svg
    assert "hello world thi..." in svg  # P7 truncation at 15 chars
    assert "b&lt;&amp;d" in svg  # XML escaping
    assert 'width="612.00"' in svg


def test_overlay_color_roundrobin():
    boxes = [(f"t{i}", [[i, 0], [i + 1, 0], [i + 1, 1], [i, 1]]) for i in range(10)]
    svg = overlay_svg(100, 100, boxes)
    # W3: box 8 cycles back to color 0
    assert svg.count(COLORS[0]) > svg.count(COLORS[3])


def test_double_layer_roundtrip():
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    pages = [
        (612.0, 792.0, b"fake-image-bytes-page-1",
         [("Hello searchable", [[50, 50], [350, 50], [350, 80], [50, 80]]),
          ("Second line", [[50, 100], [250, 100], [250, 130], [50, 130]])]),
        (612.0, 792.0, b"",
         [("Page two text", [[60, 60], [300, 60], [300, 90], [60, 90]])]),
    ]
    pdf = double_layer_pdf(pages)
    assert pdf.startswith(b"%PDF-1.7")
    doc = extract_pdf(pdf)
    assert doc.status == "ok"
    assert doc.n_pages == 2
    # invisible (render mode 3) text still parses back, in reading order
    assert "Hello searchable" in doc.pages[0].text
    assert "Second line" in doc.pages[0].text
    assert doc.pages[0].text.index("Hello searchable") < doc.pages[0].text.index(
        "Second line"
    )
    assert doc.pages[1].text == "Page two text"
    # determinism
    assert double_layer_pdf(pages) == pdf


def test_spark_sinks(spark):
    from pyspark.sql import Row

    from pdf_ocr_spark.operators.sinks import render_double_layer, render_overlays

    blocks = spark.createDataFrame(
        [
            Row(url="u1", page=1, page_w=612.0, page_h=792.0, text="alpha",
                quad=[[10.0, 10.0], [100.0, 10.0], [100.0, 30.0], [10.0, 30.0]]),
            Row(url="u1", page=1, page_w=612.0, page_h=792.0, text="beta",
                quad=[[10.0, 50.0], [100.0, 50.0], [100.0, 70.0], [10.0, 70.0]]),
            Row(url="u1", page=2, page_w=612.0, page_h=792.0, text="gamma",
                quad=[[10.0, 10.0], [100.0, 10.0], [100.0, 30.0], [10.0, 30.0]]),
        ]
    )
    svgs = {(r["url"], r["page"]): r["svg"] for r in render_overlays(blocks).collect()}
    assert len(svgs) == 2
    assert "alpha" in svgs[("u1", 1)] and "gamma" in svgs[("u1", 2)]

    pages = spark.createDataFrame(
        [
            Row(url="u1", page=1, page_w=612.0, page_h=792.0,
                image=bytearray(b"img1"), texts=["one line"],
                quads=[[[10.0, 10.0], [200.0, 10.0], [200.0, 40.0], [10.0, 40.0]]]),
            Row(url="u1", page=2, page_w=612.0, page_h=792.0,
                image=None, texts=["two line"],
                quads=[[[10.0, 10.0], [200.0, 10.0], [200.0, 40.0], [10.0, 40.0]]]),
        ]
    )
    out = render_double_layer(pages).collect()
    assert len(out) == 1 and out[0]["n_pages"] == 2
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    doc = extract_pdf(bytes(out[0]["pdf"]))
    assert doc.status == "ok" and doc.n_pages == 2
    assert "one line" in doc.pages[0].text and "two line" in doc.pages[1].text
