"""Distributed BPE trainer/encoder — pinned small-input semantics and
parity with the independent pure-python implementation
(tools/freeze_bpe_golden.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_ocr_spark.operators.tokenizer import (
    END,
    _apply_merge_expr,
    _symbols_expr,
    bpe_encode,
    bpe_train,
    word_freq_table,
)


def test_merge_fold_greedy_overlaps(spark):
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("abab",)], "w string")
    out = df.select(
        "w",
        _apply_merge_expr(F.split("w", ""), "a", "a").alias("m"),
    ).collect()
    got = {r.w: r.m for r in out}
    # greedy left-to-right: a merged pair's right symbol cannot start
    # the next match (classic BPE application semantics)
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["abab"] == ["a", "b", "a", "b"]


def test_symbols_end_marker(spark):
    df = spark.createDataFrame([("ab",)], "w string")
    assert df.select(_symbols_expr(F.col("w")).alias("s")).first().s == [
        "a", "b", END,
    ]


def test_bpe_train_hand_computed(spark):
    # corpus: 'ab' x3, 'abc' x2 → pair freqs: (a,b)=5, (b,</w>)=3,
    # (b,c)=2, (c,</w>)=2 → first merge (a,b); then (ab,</w>)=3 wins
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], "doc_id long, text string"
    )
    merges = bpe_train(word_freq_table(docs), n_merges=2)
    assert merges == [(0, "a", "b", 5), (1, "ab", END, 3)]


def test_bpe_train_min_freq_stops(spark):
    docs = spark.createDataFrame([(1, "xy zq")], "doc_id long, text string")
    # every pair occurs once → no merge reaches min_freq=2
    assert bpe_train(word_freq_table(docs), n_merges=5) == []


def test_bpe_encode_matches_python_twin(spark):
    from tools.freeze_bpe_golden import encode as py_encode
    from tools.freeze_bpe_golden import train as py_train

    corpus = [(1, "low lower lowest"), (2, "low slow lower"), (3, "new newest")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = bpe_train(word_freq_table(docs), n_merges=6)
    assert merges == py_train(corpus, 6)

    got = {r.doc_id: r.tokens for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in corpus:
        assert got[doc_id] == " ".join(py_encode(text, merges))

    # partition-order independence: training is aggregate-only
    again = bpe_train(word_freq_table(docs.repartition(7, "doc_id")), n_merges=6)
    assert again == merges


def test_bpe_multibyte_and_empty_text(spark):
    from tools.freeze_bpe_golden import encode as py_encode
    from tools.freeze_bpe_golden import train as py_train

    corpus = [(1, "日本語 日本語 テスト"), (2, "  "), (3, "日本 語テスト 日本語")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = bpe_train(word_freq_table(docs), n_merges=4)
    assert merges == py_train(corpus, 4)
    got = {r.doc_id: (r.n_tokens, r.tokens) for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in corpus:
        toks = py_encode(text, merges)
        assert got[doc_id] == (len(toks), " ".join(toks))
    assert got[2] == (0, "")  # whitespace-only doc -> zero tokens


def test_bpe_randomized_parity_with_python_twin(spark):
    """Seeded randomized corpora (deterministic, no wall-clock): the
    distributed trainer and encoder agree with the independent python
    implementation on every merge and every token stream — including
    tie-heavy corpora where the (freq, left, right) break decides."""
    import random

    from tools.freeze_bpe_golden import encode as py_encode
    from tools.freeze_bpe_golden import train as py_train

    rng = random.Random(1234)
    alphabet = "abcdexyz"
    for trial in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(12)
        ]
        corpus = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(2, 8))))
            for i in range(10)
        ]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        merges = bpe_train(word_freq_table(docs), n_merges=5)
        assert merges == py_train(corpus, 5), f"trial {trial}: merges diverge"
        got = {r.doc_id: r.tokens for r in bpe_encode(docs, merges).collect()}
        for doc_id, text in corpus:
            assert got[doc_id] == " ".join(py_encode(text, merges)), (
                f"trial {trial} doc {doc_id}: token stream diverges"
            )


def test_bpe_encode_arrow_matches_chain_and_twin(spark):
    """The production-vocab Arrow path and the codegen chain produce the
    same token streams (and both match the python twin) on the golden
    fixture corpus."""
    from pdf_ocr_spark.operators.tokenizer import bpe_encode_arrow, \
        fixture_corpus
    from tools.freeze_bpe_golden import encode as py_encode

    corpus = fixture_corpus()
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = bpe_train(word_freq_table(docs), n_merges=12)
    chain = {r.doc_id: (r.n_tokens, r.tokens)
             for r in bpe_encode(docs, merges).collect()}
    arrow = {r.doc_id: (r.n_tokens, r.tokens)
             for r in bpe_encode_arrow(docs, merges).collect()}
    assert arrow == chain
    for doc_id, text in corpus:
        toks = py_encode(text, merges)
        assert arrow[doc_id] == (len(toks), " ".join(toks))


def test_bpe_encode_arrow_thousand_merges(spark):
    """1k-merge production-shape parity: a python-twin-trained
    1000-merge table applied by the Arrow path reproduces the twin's
    token streams exactly.  (The codegen chain is deliberately NOT run
    at this size — a 1000-deep fold chain is the plan shape this path
    exists to avoid.)"""
    import random

    from pdf_ocr_spark.operators.tokenizer import bpe_encode_arrow
    from tools.freeze_bpe_golden import encode as py_encode
    from tools.freeze_bpe_golden import train as py_train

    rng = random.Random(99)
    syllables = ["ba", "ne", "to", "ri", "shu", "ka", "lo", "wi", "zen",
                 "dor", "mi", "fa"]
    words = ["".join(rng.choice(syllables)
                     for _ in range(rng.randint(1, 4)))
             for _ in range(400)]
    corpus = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(5, 30))))
        for i in range(120)
    ]
    merges = py_train(corpus, 1000)
    assert len(merges) > 300          # the corpus really yields a big table
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.tokens)
           for r in bpe_encode_arrow(docs, merges).collect()}
    for doc_id, text in corpus:
        toks = py_encode(text, merges)
        assert got[doc_id] == (len(toks), " ".join(toks)), f"doc {doc_id}"


def test_bpe_encode_arrow_multibyte_and_empty(spark):
    from pdf_ocr_spark.operators.tokenizer import bpe_encode_arrow
    from tools.freeze_bpe_golden import encode as py_encode
    from tools.freeze_bpe_golden import train as py_train

    corpus = [(1, "日本語 日本語 テスト"), (2, "  "), (3, "日本 語テスト 日本語")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = py_train(corpus, 4)
    got = {r.doc_id: (r.n_tokens, r.tokens)
           for r in bpe_encode_arrow(docs, merges).collect()}
    for doc_id, text in corpus:
        toks = py_encode(text, merges)
        assert got[doc_id] == (len(toks), " ".join(toks))
    assert got[2] == (0, "")
