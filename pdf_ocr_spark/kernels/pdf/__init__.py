"""Pure-Python PDF text-extraction kernel.

Replaces the PyMuPDF / magic-pdf delegation in the reference
(pdf_ocr_with_boxes_v3.py:111-135, pdf_ocr_with_boxes_v4.py:56-68) with a
from-scratch parser: COS object model + xref (classic tables and xref
streams), filters, page-tree walk, content-stream interpretation with full
text-matrix tracking, ToUnicode CMap decode, and XY-cut layout assembly.

Entry point: :func:`pdf_ocr_spark.kernels.pdf.extract.extract_pdf`.
"""

