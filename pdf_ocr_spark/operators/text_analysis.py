"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting — all as JVM-side column expressions (regexp_count +
arithmetic) so they run inside whole-stage codegen AND are reproducible
verbatim in the DuckDB oracle.  The pure-Python reference implementations
live in kernels/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token pattern shared with kernels.textstats.TOKEN_RE (RE2-safe: works
# identically under Java regex and DuckDB's RE2)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

_HIRAGANA = r"[぀-ゟ]"
_KATAKANA = r"[゠-ヿ]"
_CJK = r"[一-鿿]"
_HANGUL = r"[가-힯]"
_CYRILLIC = r"[Ѐ-ӿ]"
_LATIN = r"[A-Za-z]"


def token_count_expr(col: Column) -> Column:
    return F.regexp_count(col, F.lit(TOKEN_PATTERN))


def lang_guess_expr(col: Column) -> Column:
    """Script-ratio language ID (mirrors kernels.textstats.detect_lang):
    dominant script class decides; latin falls through to 'en'."""
    hira = F.regexp_count(col, F.lit(_HIRAGANA))
    kata = F.regexp_count(col, F.lit(_KATAKANA))
    cjk = F.regexp_count(col, F.lit(_CJK))
    hang = F.regexp_count(col, F.lit(_HANGUL))
    cyr = F.regexp_count(col, F.lit(_CYRILLIC))
    lat = F.regexp_count(col, F.lit(_LATIN))
    marked = hira + kata + cjk + hang + cyr + lat
    return (
        F.when(marked == 0, F.lit("unknown"))
        .when((hira + kata) > 0.05 * marked, F.lit("ja"))
        .when(hang > 0.3 * marked, F.lit("ko"))
        .when(cjk > 0.3 * marked, F.lit("zh"))
        .when(cyr > 0.3 * marked, F.lit("ru"))
        .when(lat > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality gates: length, alpha ratio, punctuation ratio,
    stopword hits, token count.  Every feature is a rounded double so the
    oracle compares exactly."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    stop = F.regexp_count(
        t, F.lit(r"(?i)\b(the|a|an|and|or|of|to|in|is|are)\b")
    )
    return docs.select(
        F.col(id_col),
        n.alias("n_chars_exact"),
        token_count_expr(t).alias("n_tokens"),
        F.round(alpha / n, 4).alias("alpha_ratio"),
        F.round(punct / n, 4).alias("punct_ratio"),
        stop.alias("n_stopwords"),
        F.round(
            F.least(n / 500.0, F.lit(1.0)) * 0.5 + F.least(stop / 20.0, F.lit(1.0)) * 0.5,
            4,
        ).alias("quality_score"),
    )


def fingerprint_expr(col: Column) -> Column:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text
    (kernels.textstats.fingerprint_md5 parity)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))
