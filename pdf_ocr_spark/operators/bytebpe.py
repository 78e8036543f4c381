"""Byte-level BPE front end (the GPT-2 / tiktoken family): the
bytes→printable-unicode alphabet and the leading-space pre-tokenizer
that byte-level trainers run BEFORE pair merging.

Why it exists as its own surface: char-BPE (``operators/tokenizer.py``)
cannot represent arbitrary bytes — web text contains every byte
sequence there is, and the GPT-2 answer is to remap all 256 byte values
onto printable unicode codepoints (Radford et al. 2019, the public
``bytes_to_unicode`` table: printable ASCII/Latin-1 map to themselves,
the 68 non-printables shift to U+0100+n) so the downstream merge loop
only ever sees clean strings while still covering every input exactly.
After this front end, byte-level training IS the existing pair-merge
machinery over the mapped alphabet — no new trainer needed.

Everything here is JVM-side codegen: UTF-8 bytes come from
``hex(encode(text))``, the 256-entry map enters the plan as one map
literal, and the pre-tokenizer is a single ``regexp_extract_all`` with
GPT-2's leading-space convention (a token keeps the space that precedes
it, which the byte map renders as ``Ġ``).  The DuckDB oracle replays
the identical mapping relationally (a 256-row VALUES join on the hex
pairs).
"""

from __future__ import annotations

from typing import Dict, List

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

PRETOKEN_PATTERN = r" ?\S+"


def bytes_to_unicode() -> Dict[int, str]:
    """The public GPT-2 byte→unicode table: bytes 33-126, 161-172 and
    174-255 map to their own codepoints; every other byte b maps to
    chr(256 + k) with k counting those bytes in ascending order."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    mapping: Dict[int, str] = {}
    k = 0
    for b in range(256):
        if b in keep:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + k)
            k += 1
    return mapping


def _byte_map_literal() -> Column:
    """The 256-entry hex-pair → mapped-char table as ONE parsed map
    literal (the _dist_structs discipline: one expression, not 256
    py4j-built branches)."""
    m = bytes_to_unicode()
    # Spark SQL single-quoted literals are backslash-escaped: '\' and
    # ''' are the two mapped chars needing escapes
    pairs = ", ".join(
        "'{h}', '{c}'".format(
            h=f"{b:02X}",
            c=ch.replace("\\", "\\\\").replace("'", "\\'"),
        )
        for b, ch in m.items()
    )
    return F.expr(f"map({pairs})")


def byte_mapped_expr(col: Column) -> Column:
    """``col``'s UTF-8 bytes rendered in the GPT-2 printable alphabet —
    hex-pair chunking over ``hex(encode(...))`` + one map lookup per
    byte, all inside codegen."""
    hx = F.hex(F.encode(col, "utf-8"))
    mapped = F.transform(
        F.sequence(F.lit(1), (F.length(hx) / 2).cast("int")),
        lambda i: F.element_at(_byte_map_literal(), hx.substr(i * 2 - 1, F.lit(2))),
    )
    return F.array_join(mapped, "")


def byte_pretokens_expr(col: Column) -> Column:
    """GPT-2-style pre-tokens of raw text (no lowercasing, no
    normalization — byte-level BPE sees the text as-is), each carrying
    its leading space, each rendered in the byte alphabet."""
    toks = F.regexp_extract_all(col, F.lit(PRETOKEN_PATTERN), 0)
    return F.transform(toks, byte_mapped_expr)


def byte_pretoken_freqs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(pretoken, cnt) over the byte-mapped pre-token stream — the
    word_freq_table twin for byte-level training (the compact weighted
    table the merge loop consumes).  One corpus-sized map-side-combined
    groupBy; everything upstream is per-row codegen."""
    toks = docs.select(
        F.explode(byte_pretokens_expr(F.col(text_col))).alias("pretoken")
    )
    return toks.groupBy("pretoken").agg(F.count(F.lit(1)).alias("cnt"))


def byte_alphabet_rows() -> List[tuple]:
    """[(byte, mapped_char)] — the full table, for the pinning query."""
    return [(b, ch) for b, ch in sorted(bytes_to_unicode().items())]
