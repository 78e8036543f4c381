"""fastText-style hashed-trigram language ID (operators/langid.py).

A/B on the labeled fixture set below (one-line news-register sentences,
the register a web crawl is full of):

    hashed-trigram NB (lang_id2):   17/17
    script-ratio heuristic:          6/17

The heuristic gets only the non-Latin scripts and English right — every
other Latin-script language (de/fr/es/it/pt/nl) collapses to 'en',
which is exactly the failure the upgrade closes.  The distributed
scorer itself is value-hash gated by the text_lang_id2 oracle (full SQL
replay of hash + weights join + argmax in DuckDB).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pdf_ocr_spark.kernels.textstats import detect_lang
from pdf_ocr_spark.operators.langid import (
    HASH_BUCKETS,
    LANGS,
    score_text,
    train_weights,
    trigram_buckets,
)

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "langid_weights.parquet",
)

# labeled evaluation set: held-out sentences (none appear in SEED_TEXT)
SAMPLES = [
    ("en", "The quick brown fox jumps over the lazy dog and then runs away from the farm."),
    ("en", "This is a test of the language identification system that we built yesterday."),
    ("de", "Der schnelle braune Fuchs springt über den faulen Hund und läuft dann weg."),
    ("de", "Die Regierung hat gestern eine neue Entscheidung über die Steuern getroffen."),
    ("fr", "Le gouvernement a pris une nouvelle décision sur les impôts hier soir."),
    ("fr", "Il y a beaucoup de personnes qui ne sont pas d'accord avec cette politique."),
    ("es", "El gobierno tomó una nueva decisión sobre los impuestos ayer por la noche."),
    ("es", "Hay muchas personas que no están de acuerdo con esta política del estado."),
    ("it", "Il governo ha preso una nuova decisione sulle tasse ieri sera a Roma."),
    ("it", "Ci sono molte persone che non sono d'accordo con questa politica nazionale."),
    ("pt", "O governo tomou uma nova decisão sobre os impostos ontem à noite no Brasil."),
    ("pt", "Há muitas pessoas que não estão de acordo com esta política do estado."),
    ("nl", "De regering heeft gisteren een nieuwe beslissing over de belastingen genomen."),
    ("ru", "Правительство вчера приняло новое решение о налогах в государстве."),
    ("ja", "昨夜、東京では大きな会議がありました。参加者は全員、その計画に賛成しました。"),
    ("zh", "昨天晚上北京有一个大会议。参加的人都同意了那个计划。大家觉得很好。"),
    ("ko", "정부는 어제 세금에 대한 새로운 결정을 내렸습니다. 이것은 중요한 문제입니다."),
]


@pytest.fixture(scope="module")
def weights():
    return {(b, l): v for b, l, v in train_weights()}


def test_frozen_weights_match_training(weights):
    """The committed parquet must be exactly train_weights() output —
    a stale freeze would silently diverge the oracle from the code."""
    df = pd.read_parquet(WEIGHTS_PATH)
    assert len(df) == HASH_BUCKETS * len(LANGS)
    frozen = {(int(r.bucket), r.lang): int(r.weight) for r in df.itertuples()}
    assert frozen == weights


def test_ab_beats_script_heuristic(weights):
    new_ok = sum(score_text(s, weights) == lang for lang, s in SAMPLES)
    old_ok = sum(detect_lang(s) == lang for lang, s in SAMPLES)
    assert new_ok == len(SAMPLES), [
        (lang, score_text(s, weights)) for lang, s in SAMPLES
        if score_text(s, weights) != lang
    ]
    assert old_ok <= 7  # heuristic: non-Latin scripts + English only
    assert new_ok > old_ok


def test_latin_language_separation(weights):
    """The specific r2-verdict complaint: romanized/Latin-script
    languages must NOT all come back 'en'."""
    preds = {
        lang: score_text(s, weights)
        for lang, s in SAMPLES
        if lang in ("de", "fr", "es", "it", "pt", "nl")
    }
    assert set(preds.values()) == {"de", "fr", "es", "it", "pt", "nl"}


def test_short_and_empty_text(weights):
    assert score_text("", weights) == "unknown"
    assert score_text("ab", weights) == "unknown"   # < 3 chars: no trigram
    assert trigram_buckets("ab") == []


def test_trigram_hash_bounds():
    bs = trigram_buckets("hello \U0010ffff world")
    assert all(0 <= b < HASH_BUCKETS for b in bs)


def test_prefix_cap_bounds_cost(weights):
    """A 10 MB document scores from its first PREFIX_CHARS chars only —
    same verdict as the truncated text (per-doc cost is bounded)."""
    long_doc = ("Die Regierung hat eine Entscheidung getroffen. " * 50000)
    assert score_text(long_doc, weights) == score_text(long_doc[:200], weights)


def test_spark_matches_python_twin(spark, weights):
    """Distributed scorer == python twin on the labeled set (the oracle
    gate re-proves this against DuckDB at sf0.01)."""
    from pdf_ocr_spark.operators.langid import lang_id2

    docs = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(SAMPLES)], "doc_id long, text string"
    )
    w = spark.read.parquet(WEIGHTS_PATH)
    got = {r.doc_id: r.lang_pred for r in lang_id2(docs, w).collect()}
    want = {i: score_text(s, weights) for i, (_, s) in enumerate(SAMPLES)}
    assert got == want
