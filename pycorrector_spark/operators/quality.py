"""Cheap quality + language-ID signals as native Spark column expressions.

These stay JVM-side (whole-stage codegen; no Python worker round-trip) and
are the frozen SQL-portable definitions of textops.quality_signals /
textops.lang_id. Parity with the Python scalar forms is test-enforced
char-for-char on the fixture set (tests/test_quality_parity.py), and with
DuckDB through the driver's oracle gate.

At 100 TB these expressions run inside the parquet scan stage — Catalyst
prunes unused columns and fuses the regexp_count/filter chain into one
codegen'd pass over each batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textops import MIN_LEN, MAX_LEN, SCRUB_PATTERNS, SCRUB_STRIP_CHARS

WS_LIT = " \t\n\r"
SYM_PATTERN = r"[^一-龥a-zA-Z0-9 \t\n\r]"
WS_PATTERN = r"[ \t\n\r]"
SPLIT_PATTERN = r"[ \t\n\r]+"
CJK_PATTERN = r"[一-龥]"
LATIN_PATTERN = r"[A-Za-z]"


def with_quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_chars, n_words, symbol_ratio, rep_ratio, len_ok."""
    c = F.col(text_col)
    stripped = F.btrim(c, F.lit(WS_LIT))
    n_chars = F.length(c)
    n_sym = F.regexp_count(c, F.lit(SYM_PATTERN))
    words = F.filter(F.split(stripped, SPLIT_PATTERN), lambda x: x != F.lit(""))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "symbol_ratio",
            F.when(n_chars > 0, n_sym / n_chars).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "rep_ratio",
            F.when(n_words > 0, F.lit(1.0) - n_distinct / n_words).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "len_ok",
            (F.length(stripped) >= MIN_LEN) & (F.length(stripped) <= MAX_LEN),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add lang_id + lang_conf (frozen heuristic, textops.lang_id)."""
    c = F.col(text_col)
    n_ns = F.length(c) - F.regexp_count(c, F.lit(WS_PATTERN))
    cjk_ratio = F.regexp_count(c, F.lit(CJK_PATTERN)) / n_ns
    latin_ratio = F.regexp_count(c, F.lit(LATIN_PATTERN)) / n_ns
    lang = (
        F.when(n_ns <= 0, F.lit("und"))
        .when(cjk_ratio >= 0.3, F.lit("zh"))
        .when(latin_ratio >= 0.5, F.lit("en"))
        .otherwise(F.lit("und"))
    )
    conf = (
        F.when(n_ns <= 0, F.lit(0.0))
        .when(cjk_ratio >= 0.3, cjk_ratio)
        .when(latin_ratio >= 0.5, latin_ratio)
        .otherwise(F.greatest(cjk_ratio, latin_ratio))
    )
    return df.withColumn("lang_id", lang).withColumn("lang_conf", conf)


def scrub_expr(text_col: str = "text") -> Column:
    """Native (JVM-codegen) scrub: the same SCRUB_PATTERNS chain as the
    pandas stage, as regexp_replace expressions. Parity with
    textops.scrub_text is test-enforced."""
    c = F.col(text_col)
    for _name, pat, repl in SCRUB_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return F.btrim(c, F.lit(SCRUB_STRIP_CHARS))


def with_scrubbed(df: DataFrame, text_col: str = "text", out: str = "scrubbed_text") -> DataFrame:
    return df.withColumn(out, scrub_expr(text_col))
