"""Byte-level BPE front end: the GPT-2 alphabet, hex-pair mapping of
tricky inputs (multibyte UTF-8, escapes), and the leading-space
pre-tokenizer."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_ocr_spark.operators.bytebpe import (
    byte_mapped_expr,
    byte_pretoken_freqs,
    byte_pretokens_expr,
    bytes_to_unicode,
)


def _py_map(s: str) -> str:
    m = bytes_to_unicode()
    return "".join(m[b] for b in s.encode("utf-8"))


def test_alphabet_is_a_printable_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    assert m[ord("a")] == "a" and m[ord("!")] == "!"
    assert m[0x20] == "Ġ"          # space -> the famous leading-G
    assert m[0x0A] == "Ċ"          # newline
    assert all(len(c) == 1 for c in m.values())


def test_byte_mapping_matches_python_on_tricky_strings(spark):
    rows = [
        ("hello world",),
        ("back\\slash 'quote' \"dq\"",),
        ("café 中文 \U0001f600",),   # 2-, 3-, 4-byte UTF-8
        ("tab\there\nnewline",),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r["m"] for r in df.select(byte_mapped_expr(F.col("s")).alias("m")).collect()]
    assert got == [_py_map(s) for (s,) in rows]


def test_pretokens_keep_leading_space(spark):
    df = spark.createDataFrame([("the cat  sat",)], "s string")
    toks = df.select(byte_pretokens_expr(F.col("s")).alias("t")).first().t
    # first token has no leading space; later ones carry exactly one
    assert toks == ["the", "Ġcat", "Ġsat"]
    freqs = {
        r["pretoken"]: r["cnt"]
        for r in byte_pretoken_freqs(
            spark.createDataFrame([("a a b",), ("a",)], "text string")
        ).collect()
    }
    assert freqs == {"a": 2, "Ġa": 1, "Ġb": 1}
