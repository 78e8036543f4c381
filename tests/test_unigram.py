"""Distributed unigram-LM trainer/encoder (SentencePiece family,
Viterbi hard-EM) — pinned small-input semantics and parity with the
independent pure-python implementation
(tools/freeze_unigram_golden.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from pdf_ocr_spark.operators.tokenizer import word_freq_table
from pdf_ocr_spark.operators.unigram import (
    fixture_corpus,
    seed_piece_counts,
    substrings_expr,
    unigram_encode,
    unigram_train,
    viterbi_segment,
)


def test_substrings_enumeration(spark):
    df = spark.createDataFrame([("abc",)], "w string")
    subs = df.select(substrings_expr(F.col("w"), 2).alias("s")).first().s
    # position-major: per start, lengths 1..min(L, remaining)
    assert subs == ["a", "ab", "b", "bc", "c"]


def test_seed_counts_weighted_overlaps(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa ab")], "doc_id long, text string"
    )
    rows = seed_piece_counts(word_freq_table(docs), max_piece_len=2).collect()
    got = {r.piece: r.freq for r in rows}
    # 'aa' x2 contributes a:2/word, aa:1/word; 'ab' contributes a,b,ab
    assert got == {"a": 5, "aa": 2, "b": 1, "ab": 1}


def test_viterbi_prefers_high_probability_pieces():
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5)}
    assert viterbi_segment("abab", logp, 4) == ["ab", "ab"]
    # unknown spans fall back to chars (coverage vocab)
    assert viterbi_segment("ba", logp, 4) == ["b", "a"]


def test_viterbi_tie_keeps_longest_piece():
    # p(ab)+p(c) == p(a)+p(bc) in log space: at the final position the
    # ascending-j scan sees j=1 (last piece 'bc') before j=2 ('c'), and
    # the strict-> update keeps the first — the longest last piece.
    p = math.log(0.25)
    logp = {"a": p, "c": p, "ab": p, "bc": p}
    assert viterbi_segment("abc", logp, 4) == ["a", "bc"]


def test_train_covers_all_chars_and_caps_size(spark):
    corpus = spark.createDataFrame(fixture_corpus(), "doc_id long, text string")
    vocab = unigram_train(word_freq_table(corpus), vocab_size=40,
                          rounds=2, max_piece_len=4, seed_size=150)
    pieces = [p for p, _ in vocab]
    assert len(pieces) == len(set(pieces)) <= 40
    chars = {c for _, t in fixture_corpus() for w in t.split() for c in w}
    assert chars <= set(p for p in pieces if len(p) == 1)
    # multi-char pieces actually emerged (the point of the trainer)
    assert any(len(p) >= 3 for p in pieces)


def test_train_matches_python_twin(spark):
    from tools.freeze_unigram_golden import train as py_train

    corpus = fixture_corpus()
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = unigram_train(word_freq_table(df), vocab_size=40, rounds=2,
                        max_piece_len=4, seed_size=150)
    assert got == py_train(corpus)


def test_encode_matches_python_twin_and_rejoins(spark):
    from tools.freeze_unigram_golden import encode as py_encode
    from tools.freeze_unigram_golden import train as py_train

    corpus = fixture_corpus()
    vocab = py_train(corpus)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = unigram_encode(df, vocab, max_piece_len=4).orderBy("doc_id").collect()
    got = [(r.doc_id, r.n_tokens, r.tokens) for r in rows]
    assert got == py_encode(corpus, vocab)
    # segmentation is lossless: pieces re-join to the normalized words
    for (_, text), (_, _, toks) in zip(corpus, got):
        assert "".join(toks.split(" ")) == text.replace(" ", "")


def test_frozen_goldens_match_current_semantics(spark):
    """The committed goldens must equal what the twin produces today —
    a semantics drift in either implementation breaks this first."""
    import pandas as pd

    from pdf_ocr_spark.queries import _golden
    from tools.freeze_unigram_golden import encode as py_encode
    from tools.freeze_unigram_golden import train as py_train

    corpus = fixture_corpus()
    vocab = py_train(corpus)
    gv = pd.read_parquet(_golden("unigram_vocab"))
    assert list(map(tuple, gv.itertuples(index=False))) == vocab
    ge = pd.read_parquet(_golden("unigram_encode"))
    assert list(map(tuple, ge.itertuples(index=False))) == py_encode(
        corpus, vocab
    )
