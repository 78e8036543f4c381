"""Distributed WordPiece trainer/encoder (likelihood merge criterion,
BERT MaxMatch runtime) — pinned small-input semantics and parity with
the independent pure-python implementation
(tools/freeze_wordpiece_golden.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_ocr_spark.operators.tokenizer import word_freq_table
from pdf_ocr_spark.operators.wordpiece import (
    UNK,
    eval_corpus,
    fixture_corpus,
    max_match,
    wordpiece_encode,
    wordpiece_pair_scores,
    wordpiece_symbols_expr,
    wordpiece_train,
)


def test_initial_symbols_continuation_prefix(spark):
    df = spark.createDataFrame([("abc",), ("x",)], "w string")
    got = [r.s for r in df.select(wordpiece_symbols_expr(F.col("w")).alias("s")).collect()]
    assert got == [["a", "##b", "##c"], ["x"]]


def test_pair_scores_likelihood_criterion(spark):
    # 'ab' x4 and 'cd' x1 have the same pair probability mass shape but
    # different frequencies: the likelihood ratio normalizes them to the
    # SAME quantized score while raw freq ranks them apart.
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab cd")], "doc_id long, text string"
    )
    rows = wordpiece_pair_scores(word_freq_table(docs)).collect()
    got = {(r.l, r.r): (r.freq, r.score_q) for r in rows}
    # freq(ab)=4, fl(a)=4, fr(##b)=4 -> 4e12/16; freq(cd)=1, 1e12/1
    assert got[("a", "##b")] == (4, 4 * 10**12 // 16)
    assert got[("c", "##d")] == (1, 10**12)
    # the likelihood criterion prefers the rare-but-exclusive pair
    assert got[("c", "##d")][1] > got[("a", "##b")][1]


def test_max_match_longest_prefix_and_unk():
    vset = frozenset(["un", "##able", "##a", "##ble", "a"])
    assert max_match("unable", vset, 4) == ["un", "##able"]
    # no piece covers position 0 -> whole-word UNK even if a suffix matches
    assert max_match("zable", vset, 4) == [UNK]
    # greedy: longest piece at each position, not globally optimal
    assert max_match("aable", vset, 4) == ["a", "##able"]


def test_train_matches_python_twin(spark):
    from tools.freeze_wordpiece_golden import train as py_train

    corpus = fixture_corpus()
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges, vocab = wordpiece_train(word_freq_table(df), n_merges=8)
    py_merges, py_vocab = py_train(corpus)
    assert merges == py_merges
    assert vocab == py_vocab
    # continuation prefixes survive merging: ##-pieces merged with
    # ##-pieces stay continuations, word-initial merges stay bare
    assert any(p.startswith("##") for p, _ in vocab)
    assert any(not p.startswith("##") for p, _ in vocab)


def test_encode_matches_python_twin(spark):
    from tools.freeze_wordpiece_golden import encode as py_encode
    from tools.freeze_wordpiece_golden import train as py_train

    _, vocab = py_train(fixture_corpus())
    corpus = eval_corpus()
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = wordpiece_encode(df, vocab).orderBy("doc_id").collect()
    got = [(r.doc_id, r.n_tokens, r.tokens) for r in rows]
    assert got == py_encode(corpus, vocab)
    # the eval rows exercise BOTH backoff shapes
    tail = " ".join(t for _, _, t in got[-2:])
    assert UNK in tail and "##" in tail


def test_frozen_goldens_match_current_semantics(spark):
    """The committed goldens must equal what the twin produces today —
    a semantics drift in either implementation breaks this first."""
    import pandas as pd

    from pdf_ocr_spark.queries import _golden
    from tools.freeze_wordpiece_golden import encode as py_encode
    from tools.freeze_wordpiece_golden import train as py_train

    _, vocab = py_train(fixture_corpus())
    gv = pd.read_parquet(_golden("wordpiece_vocab"))
    assert list(map(tuple, gv.itertuples(index=False))) == vocab
    ge = pd.read_parquet(_golden("wordpiece_encode"))
    assert list(map(tuple, ge.itertuples(index=False))) == py_encode(
        eval_corpus(), vocab
    )
