"""Cheap quality + language-ID signals as native Spark column expressions.

These stay JVM-side (whole-stage codegen; no Python worker round-trip) and
are the frozen SQL-portable definitions of textops.quality_signals /
textops.lang_id. Parity with the Python scalar forms is test-enforced on
the fixture set (tests/test_textops.py signal tests + the pipeline parity
suite), and with DuckDB through the driver's oracle gate. NULL text is
treated as '' (same as the pandas path's fillna).

At 100 TB these expressions run inside the parquet scan stage — Catalyst
prunes unused columns and fuses the regexp_count/filter chain into one
codegen'd pass over each batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textops import (
    CJK_PATTERN,
    LATIN_PATTERN,
    MAX_LEN,
    MIN_LEN,
    NON_ALNUM_PATTERN as SYM_PATTERN,
    SCRUB_PATTERNS,
    SCRUB_STRIP_CHARS,
    WORD_SPLIT_PATTERN as SPLIT_PATTERN,
    WS_CHARS as WS_LIT,
    WS_PATTERN,
)


def with_quality_columns(
    df: DataFrame, text_col: str = "text",
    min_len: int = MIN_LEN, max_len: int = MAX_LEN,
) -> DataFrame:
    """Add n_chars, n_words, symbol_ratio, rep_ratio, len_ok."""
    c = F.coalesce(F.col(text_col), F.lit(""))
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
            (F.length(stripped) >= min_len) & (F.length(stripped) <= max_len),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add lang_id + lang_conf (frozen heuristic, textops.lang_id)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
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
    c = F.coalesce(F.col(text_col), F.lit(""))
    for _name, pat, repl in SCRUB_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return F.btrim(c, F.lit(SCRUB_STRIP_CHARS))


def with_scrubbed(df: DataFrame, text_col: str = "text", out: str = "scrubbed_text") -> DataFrame:
    return df.withColumn(out, scrub_expr(text_col))
