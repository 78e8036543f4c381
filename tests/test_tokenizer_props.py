"""Property tests (hypothesis) for the pure tokenizer kernels shared by
the distributed encoders: unigram Viterbi and WordPiece MaxMatch.  No
Spark — these pin the row-level semantics the Arrow stages broadcast."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_spark.operators.unigram import viterbi_segment
from pdf_ocr_spark.operators.wordpiece import UNK, max_match

WORDS = st.text(alphabet="abcd", min_size=1, max_size=12)


def _char_cover_scores(word_universe: str) -> dict:
    # every char present -> every word segments
    chars = sorted(set(word_universe))
    return {c: math.log(1.0 / len(chars)) for c in chars}


@given(w=WORDS, extra=st.lists(st.text(alphabet="abcd", min_size=2, max_size=4), max_size=6))
@settings(max_examples=200, deadline=None)
def test_viterbi_lossless_and_in_vocab(w, extra):
    logp = _char_cover_scores("abcd")
    for p in extra:
        logp.setdefault(p, math.log(0.3))
    pieces = viterbi_segment(w, logp, max_piece_len=4)
    assert "".join(pieces) == w
    assert all(p in logp for p in pieces)
    # optimality against brute force on short words
    if len(w) <= 6:
        best = None

        def enum(rest, acc, score):
            nonlocal best
            if not rest:
                if best is None or score > best:
                    best = score
                return
            for ln in range(1, min(4, len(rest)) + 1):
                p = rest[:ln]
                if p in logp:
                    enum(rest[ln:], acc + [p], score + logp[p])

        enum(w, [], 0.0)
        got = sum(logp[p] for p in pieces)
        assert best is not None and abs(got - best) < 1e-9


@given(w=WORDS, vocab_extra=st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), max_size=8))
@settings(max_examples=200, deadline=None)
def test_max_match_lossless_or_unk(w, vocab_extra):
    # vocabulary may or may not cover the word — both paths must hold
    vset = frozenset(
        list(vocab_extra)
        + ["##" + v for v in vocab_extra]
        + ["a", "##a"]  # partial coverage only
    )
    out = max_match(w, vset, max_len=4)
    if out == [UNK]:
        return
    # lossless: strip ## continuations and rejoin
    joined = "".join(p[2:] if p.startswith("##") else p for p in out)
    assert joined == w
    # every piece is in vocab, first bare, rest continuations
    assert out[0] in vset and not out[0].startswith("##")
    assert all(p.startswith("##") and p in vset for p in out[1:])
    # greediness: no piece could have been longer at its position
    pos = 0
    for i, p in enumerate(out):
        plen = len(p) - 2 if p.startswith("##") else len(p)
        for longer in range(min(4, len(w) - pos), plen, -1):
            cand = w[pos:pos + longer] if pos == 0 else "##" + w[pos:pos + longer]
            assert cand not in vset
        pos += plen
