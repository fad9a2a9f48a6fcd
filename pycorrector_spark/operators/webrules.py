"""Web-corpus quality rules: Gopher repetition signals + C4 line filtering.

These are the published web-text quality heuristics a Common-Crawl-scale
training-data pipeline runs alongside the LM/error-detection stages
(Gopher, Rae et al. 2021 §A1.1; C4, Raffel et al. 2020 §2.2) — the
reference's quality machinery (detector.py length/heuristic gates) covers
per-sentence scoring, these cover the page-structure signals it has no
equivalent for. Everything here is native Spark column expressions
(higher-order array functions inside whole-stage codegen — zero Python
workers, zero shuffles for the per-document signals) with exact DuckDB
equivalents so the driver's oracle gate verifies value-for-value.

Scale notes (100 TB): the per-document signals are embarrassingly
parallel map expressions fused into the parquet scan stage. The one
relational operator (``top_ngram_frac``: most-frequent word n-gram per
document) deliberately avoids the O(L²) per-row lambda formulation and
instead explodes n-grams and aggregates — two shuffles keyed on
(doc_id, gram) / doc_id, both linear in corpus size and AQE-coalesced.

The synthetic documents table is single-line prose, so line/paragraph
rules would be vacuous on it; ``webpage_text_expr`` deterministically
folds each document into a multi-line, multi-paragraph page (with
boilerplate/bullet/ellipsis/terminal-punctuation line decorations keyed
on ``(doc_id + line_index)`` residues) IDENTICALLY in Spark and in the
oracle CTE, so every rule fires in both directions on real driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textops import WORD_SPLIT_PATTERN

# ---------------------------------------------------------------------------
# frozen constants (shared by the Spark expressions and the DuckDB oracle)
# ---------------------------------------------------------------------------

WORDS_PER_LINE = 6
LINES_PER_PARA = 4
BOILERPLATE_LINE = "enable javascript and cookies to continue"

# Gopher §A1.1 thresholds (word-count floor lowered 50 -> 10: the synthetic
# documents average ~60 words; everything else is the published value)
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_5GRAM_FRAC = 0.15
GOPHER_MAX_BULLET_FRAC = 0.90
GOPHER_MAX_ELLIPSIS_FRAC = 0.30
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOPWORD_HITS = 1

# ten most frequent English function words (Gopher uses a similar tiny set)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "that", "is", "for", "with")

# C4 §2.2 line rules
C4_MIN_WORDS_PER_LINE = 5
C4_TERMINAL_PUNCT_RE = '[.!?"…]$'
C4_BAD_LINE_SUBSTRINGS = ("javascript", "cookie")
C4_BAD_DOC_SUBSTRINGS = ("lorem ipsum", "{")
C4_MIN_KEPT_LINES = 3

ALPHA_WORD_RE = "[A-Za-z一-龥]"
BULLET_PREFIXES = ("- ", "* ", "• ")
ELLIPSIS_SUFFIXES = ("...", "…")

# occurrence packing for keep-first winner aggregates: (doc_id, pos) ->
# doc_id * LIMIT + pos (shared by paragraph_dedup here and
# dedup.substring_dedup)
OCC_POS_LIMIT = 1 << 20


def packed_occurrence(doc_id: Column, pos: Column) -> Column:
    """(doc_id, pos) packed into one BIGINT whose ordering equals the
    lexicographic pair ordering while ``pos < OCC_POS_LIMIT``. The bound
    is ENFORCED: a row beyond it raises at runtime instead of silently
    colliding with the next doc_id's positions (assert_true yields NULL
    when the predicate holds, so the coalesce adds 0 on the happy path)."""
    doc_limit = ((1 << 63) - 1) // OCC_POS_LIMIT  # BIGINT overflow bound
    guard = F.coalesce(
        F.assert_true(
            (pos < OCC_POS_LIMIT) & (doc_id < F.lit(doc_limit)) & (doc_id >= 0),
            F.lit(f"occurrence out of packing range (pos < {OCC_POS_LIMIT}, "
                  f"0 <= doc_id < {doc_limit}); packed winner keys would "
                  "collide or wrap — raise OCC_POS_LIMIT / repartition ids"),
        ).cast("bigint"),
        F.lit(0),
    )
    return doc_id * F.lit(OCC_POS_LIMIT) + pos + guard


# ---------------------------------------------------------------------------
# deterministic multi-line page synthesis (Spark side)
# ---------------------------------------------------------------------------


def webpage_text_expr(doc_id: Column, text: Column) -> Column:
    """Fold a one-line document into a deterministic multi-line page.

    Words are grouped ``WORDS_PER_LINE`` per line; line ``i`` of document
    ``d`` is decorated by the first matching residue of ``m = d + i``:
    ``m%7==0`` -> the boilerplate line, ``m%3==0`` -> terminal ``.``,
    ``m%5==0`` -> trailing ``...``, ``m%4==0`` -> ``- `` bullet prefix.
    Lines are grouped ``LINES_PER_PARA`` per paragraph joined by blank
    lines. Pure integer arithmetic + array ops: bit-identical in any
    engine, which is what lets the oracle CTE reproduce it in SQL.
    """
    words = F.filter(
        F.split(F.coalesce(text, F.lit("")), " "), lambda x: x != F.lit("")
    )
    nw = F.size(words)
    nl = F.ceil(nw / F.lit(float(WORDS_PER_LINE))).cast("int")

    def line_of(i: Column) -> Column:
        base = F.array_join(F.slice(words, i * WORDS_PER_LINE + 1, WORDS_PER_LINE), " ")
        m = doc_id + i
        return (
            F.when(m % 7 == 0, F.lit(BOILERPLATE_LINE))
            .when(m % 3 == 0, F.concat(base, F.lit(".")))
            .when(m % 5 == 0, F.concat(base, F.lit("...")))
            .when(m % 4 == 0, F.concat(F.lit("- "), base))
            .otherwise(base)
        )

    lines = F.transform(F.sequence(F.lit(0), nl - 1), line_of)
    npara = F.ceil(nl / F.lit(float(LINES_PER_PARA))).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), npara - 1),
        lambda j: F.array_join(F.slice(lines, j * LINES_PER_PARA + 1, LINES_PER_PARA), "\n"),
    )
    return F.when(nw > 0, F.array_join(paras, "\n\n")).otherwise(F.lit(""))


def webpage_text_cte(docs_table: str = "documents") -> str:
    """DuckDB CTE chain producing (doc_id, page_text) — the exact mirror of
    :func:`webpage_text_expr` (same constants, same residue order)."""
    w, p = WORDS_PER_LINE, LINES_PER_PARA
    return f"""
        WITH wl AS (
          SELECT doc_id,
                 list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS words
          FROM {docs_table}
        ), wl1 AS (
          SELECT doc_id, words, len(words) AS nw,
                 CAST(ceil(len(words) / {float(w)}) AS INT) AS nl
          FROM wl
        ), wl2 AS (
          SELECT doc_id, nw, nl,
                 list_transform(generate_series(0, nl - 1), i ->
                   CASE WHEN (doc_id + i) % 7 = 0 THEN '{BOILERPLATE_LINE}'
                        WHEN (doc_id + i) % 3 = 0
                          THEN array_to_string(list_slice(words, i*{w}+1, i*{w}+{w}), ' ') || '.'
                        WHEN (doc_id + i) % 5 = 0
                          THEN array_to_string(list_slice(words, i*{w}+1, i*{w}+{w}), ' ') || '...'
                        WHEN (doc_id + i) % 4 = 0
                          THEN '- ' || array_to_string(list_slice(words, i*{w}+1, i*{w}+{w}), ' ')
                        ELSE array_to_string(list_slice(words, i*{w}+1, i*{w}+{w}), ' ')
                   END) AS lines
          FROM wl1
        ), web AS (
          SELECT doc_id,
                 CASE WHEN nw > 0 THEN
                   array_to_string(
                     list_transform(generate_series(0, CAST(ceil(nl / {float(p)}) AS INT) - 1), j ->
                       array_to_string(list_slice(lines, j*{p}+1, j*{p}+{p}), chr(10))),
                     chr(10) || chr(10))
                 ELSE '' END AS page_text
          FROM wl2
        )
    """


def with_webpage_text(df: DataFrame, out: str = "page_text") -> DataFrame:
    return df.withColumn(out, webpage_text_expr(F.col("doc_id"), F.col("text")))


# ---------------------------------------------------------------------------
# Gopher repetition + structure signals (per-document map expressions)
# ---------------------------------------------------------------------------


def _sum_len(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))


def with_gopher_columns(df: DataFrame, text_col: str = "page_text") -> DataFrame:
    """Add the Gopher §A1.1 repetition/structure signals + ``gopher_keep``.

    All divisions are int/int in IEEE double (identical bits in Spark and
    DuckDB); empty denominators yield the published "degenerate page"
    default (fraction 0.0 but word-count rule already drops the page).

    The split/distinct/5-gram arrays are STAGED through intermediate
    projections (aliased columns referenced by the signal expressions)
    instead of being inlined into each signal: lambda-bound higher-order
    functions defeat codegen subexpression elimination, so the fused
    single-projection form re-ran the word-regex split once per reference
    — nested references multiplied it to ~30 splits per row, measured 16x
    slower at sf0.1 than this staged plan (17 s -> 1 s for the identical
    output). CollapseProject keeps multi-referenced non-cheap aliases
    materialized, so the staging survives optimization.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    st1 = df.select(
        "*",
        F.filter(F.split(c, "\n"), lambda x: x != F.lit("")).alias("_gx_lines"),
        F.filter(F.split(c, "\n\n"), lambda x: x != F.lit("")).alias("_gx_paras"),
        F.filter(F.split(c, WORD_SPLIT_PATTERN), lambda x: x != F.lit("")).alias(
            "_gx_words"
        ),
    )
    lines, paras, words = F.col("_gx_lines"), F.col("_gx_paras"), F.col("_gx_words")
    nw = F.size(words)
    st2 = st1.select(
        "*",
        F.array_distinct(lines).alias("_gx_dlines"),
        F.array_distinct(paras).alias("_gx_dparas"),
        F.when(
            nw >= 5,
            F.transform(
                F.sequence(F.lit(1), nw - 4),
                lambda i: F.array_join(F.slice(words, i, 5), " "),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_gx_g5"),
    )

    n_lines = F.size(lines)
    nd_lines = F.size("_gx_dlines")
    lc = _sum_len(lines)
    lc_d = _sum_len(F.col("_gx_dlines"))
    n_paras = F.size(paras)
    nd_paras = F.size("_gx_dparas")
    pc = _sum_len(paras)
    pc_d = _sum_len(F.col("_gx_dparas"))
    n_g5 = F.size("_gx_g5")

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    bullet = F.size(
        F.filter(
            lines,
            lambda x: F.aggregate(
                F.array(*[F.lit(p) for p in BULLET_PREFIXES]),
                F.lit(False),
                lambda acc, p: acc | x.startswith(p),
            ),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda x: F.aggregate(
                F.array(*[F.lit(s) for s in ELLIPSIS_SUFFIXES]),
                F.lit(False),
                lambda acc, s: acc | x.endswith(s),
            ),
        )
    )
    alpha_words = F.size(F.filter(words, lambda x: x.rlike(ALPHA_WORD_RE)))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    )

    out = (
        st2.withColumn("n_lines", n_lines)
        .withColumn("n_paras", n_paras)
        .withColumn("gw_words", nw)
        .withColumn("dup_line_frac", frac(n_lines - nd_lines, n_lines))
        .withColumn("dup_line_char_frac", frac(lc - lc_d, lc))
        .withColumn("dup_para_frac", frac(n_paras - nd_paras, n_paras))
        .withColumn("dup_para_char_frac", frac(pc - pc_d, pc))
        .withColumn("dup_5gram_frac", frac(n_g5 - F.size(F.array_distinct("_gx_g5")), n_g5))
        .withColumn("mean_word_len", frac(_sum_len(words), nw))
        .withColumn("bullet_line_frac", frac(bullet, n_lines))
        .withColumn("ellipsis_line_frac", frac(ellipsis, n_lines))
        .withColumn("alpha_word_frac", frac(alpha_words, nw))
        .withColumn("stopword_hits", stop_hits)
        .drop("_gx_lines", "_gx_paras", "_gx_words", "_gx_dlines", "_gx_dparas", "_gx_g5")
    )
    keep = (
        (F.col("gw_words") >= GOPHER_MIN_WORDS)
        & (F.col("gw_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC)
        & (F.col("dup_line_char_frac") <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        & (F.col("dup_para_frac") <= GOPHER_MAX_DUP_PARA_FRAC)
        & (F.col("dup_para_char_frac") <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
        & (F.col("dup_5gram_frac") <= GOPHER_MAX_DUP_5GRAM_FRAC)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
    )
    return out.withColumn("gopher_keep", keep)


# ---------------------------------------------------------------------------
# top word-n-gram character fraction (relational: explode -> agg -> top-1)
# ---------------------------------------------------------------------------


def top_ngram_frac(df: DataFrame, text_col: str = "page_text", n: int = 2) -> DataFrame:
    """Most frequent word ``n``-gram per document and the fraction of
    word characters it covers (Gopher's top-n-gram rule, n=2..4).

    Relational formulation on purpose: the naive per-row
    ``array_max(transform(distinct, count-in-array))`` lambda is O(L²)
    per document — quadratic in page length, a stall on a 1 MB page.
    Exploding n-grams and aggregating is linear, shuffles only
    (doc_id, gram) integers+shortstrings, and AQE coalesces the
    post-shuffle partitions. Documents with fewer than ``n`` words have
    no n-gram and are absent from the output (same in the oracle).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(c, WORD_SPLIT_PATTERN), lambda x: x != F.lit(""))
    nw = F.size(words)
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    from pyspark.sql import Window

    base = df.select(
        "doc_id",
        _sum_len(words).alias("total_wchars"),
        F.explode(grams).alias("gram"),
    )
    cnt = base.groupBy("doc_id", "total_wchars", "gram").agg(F.count("*").alias("top_cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("top_cnt"), F.asc("gram"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_gram"),
            "top_cnt",
            (
                F.col("top_cnt")
                * F.length(F.regexp_replace("gram", " ", ""))
                / F.col("total_wchars").cast("double")
            ).alias("top_ngram_char_frac"),
        )
    )


# ---------------------------------------------------------------------------
# C4 line-level filter
# ---------------------------------------------------------------------------


def with_c4_filter(df: DataFrame, text_col: str = "page_text") -> DataFrame:
    """C4 §2.2: keep only lines with >= 5 words that end in terminal
    punctuation and carry no javascript/cookie boilerplate; drop the whole
    page when it contains ``lorem ipsum`` or ``{``. Adds ``c4_text`` (the
    retained lines re-joined), ``c4_n_kept`` and ``c4_keep``."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(c, "\n"), lambda x: x != F.lit(""))

    def line_ok(x: Column) -> Column:
        n_words = F.size(F.filter(F.split(x, " "), lambda t: t != F.lit("")))
        bad = F.aggregate(
            F.array(*[F.lit(s) for s in C4_BAD_LINE_SUBSTRINGS]),
            F.lit(False),
            lambda acc, s: acc | F.lower(x).contains(s),
        )
        return (n_words >= C4_MIN_WORDS_PER_LINE) & x.rlike(C4_TERMINAL_PUNCT_RE) & ~bad

    doc_bad = F.aggregate(
        F.array(*[F.lit(s) for s in C4_BAD_DOC_SUBSTRINGS]),
        F.lit(False),
        lambda acc, s: acc | F.lower(c).contains(s),
    )
    # stage the kept-lines array: it is referenced three times below, and
    # lambda-bound filters are not CSE'd (see with_gopher_columns)
    staged = df.select("*", F.filter(lines, line_ok).alias("_c4_kept"))
    return (
        staged.withColumn("c4_text", F.array_join(F.col("_c4_kept"), "\n"))
        .withColumn("c4_n_kept", F.size("_c4_kept"))
        .withColumn(
            "c4_keep", (F.size("_c4_kept") >= C4_MIN_KEPT_LINES) & ~doc_bad
        )
        .drop("_c4_kept")
    )


# ---------------------------------------------------------------------------
# CCNet-style corpus-frequency line dedup (cross-document boilerplate)
# ---------------------------------------------------------------------------

# a line appearing in more than this many DISTINCT documents is corpus
# boilerplate (nav bars, cookie banners, footers) and is removed from
# every document. CCNet (Wenzek et al. 2020 §4.1) does exactly this with
# paragraph hashes over each Common-Crawl shard.
LINE_DEDUP_MAX_DF = 100


def corpus_line_dedup(df: DataFrame, text_col: str = "page_text",
                      max_line_df: int = LINE_DEDUP_MAX_DF) -> DataFrame:
    """Remove lines that occur in more than ``max_line_df`` distinct
    documents; return ``(doc_id, clean_text, n_dropped_lines)``.

    Unlike the per-document Gopher/C4 rules this is a CORPUS-level
    operator: the line->document-frequency table is an aggregation over
    the whole input. Plan shape (100 TB):

    1. ``posexplode`` lines (empty separator lines pass through untouched
       — they carry the paragraph structure and are never boilerplate).
    2. One map-side-combined ``groupBy(line)`` with ``countDistinct`` to
       find the drop set. The drop set is tiny by construction — only
       lines shared by >``max_line_df`` documents — so the subsequent
       LEFT ANTI join is broadcast (AQE picks this up from the runtime
       size; at petabyte scale hash the line to a 64-bit key first).
    3. One ``groupBy(doc_id)`` to reassemble kept lines in original
       order (``sort_array`` of (pos, line) structs — no window, no
       per-partition ordering assumption).

    No driver-side collect anywhere; three shuffles total, two of them
    over the small exploded-lines relation.
    """
    from pyspark.sql import functions as F

    base = df.select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    ex = base.select(
        "doc_id", F.posexplode(F.split(F.col("t"), "\n")).alias("pos", "line")
    )
    drop_set = (
        ex.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") > max_line_df)
        .select("line")
    )
    kept = ex.join(F.broadcast(drop_set), on="line", how="left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    n_lines = base.select(
        "doc_id", F.size(F.split(F.col("t"), "\n")).alias("n_lines")
    )
    return (
        n_lines.join(agg, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_dropped_lines"),
        )
    )


def paragraph_dedup(df: DataFrame, text_col: str = "page_text") -> DataFrame:
    """Corpus-level exact paragraph dedup, keep-first (MassiveText, Rae et
    al. 2021 §A1.2 "repetition removal" at document granularity; CCNet
    runs the same shape on paragraphs before LM scoring).

    Every paragraph occurrence except the globally FIRST one (minimal
    ``(doc_id, pos)`` over identical paragraph text) is removed; empty
    paragraphs (structure separators) always survive. Returns
    ``(doc_id, clean_text, n_dropped_paras)``.

    Plan shape (100 TB):

    1. ``posexplode`` paragraphs; key each occurrence by ``md5`` of the
       paragraph so the shuffle moves a 32-byte key + position, not the
       paragraph body, for the aggregate side.
    2. ONE map-side-combined ``groupBy(pk)`` computing the winner
       occurrence as ``min(struct(doc_id, pos))`` — deterministic on any
       partitioning.
    3. ONE sort-merge join occurrences->winners on ``pk`` keeping rows
       equal to the winner (AQE skew-join splits a mega-duplicated
       paragraph's hot key; a window ``rank() OVER (PARTITION BY pk)``
       would be one shuffle fewer but pins each hot key to one task).
    4. ``groupBy(doc_id)`` reassembly via sort_array of (pos, para)
       structs — no window, no per-partition ordering assumption.

    Unlike :func:`corpus_line_dedup` (drop ALL occurrences of
    high-frequency lines) this keeps one canonical copy, so unique
    content inside partially-duplicated pages is never lost.
    """
    base = df.select("doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    ex = base.select(
        "doc_id", F.posexplode(F.split(F.col("t"), "\n\n")).alias("pos", "para")
    )
    # winner key packs (doc_id, pos) into one BIGINT: min(struct) forces a
    # SortAggregate (structs aren't mutable hash-agg buffer types), packing
    # keeps the winner aggregate in HashAggregate with map-side combine.
    # Bound (< 2^20 paragraphs/doc) is runtime-enforced by the guard.
    packed = packed_occurrence(F.col("doc_id"), F.col("pos"))
    nonempty = ex.filter(F.col("para") != "").withColumn("pk", F.md5(F.col("para")))
    winners = nonempty.groupBy("pk").agg(F.min(packed).alias("w"))
    kept_dup = (
        nonempty.join(winners, on="pk")
        .filter(packed == F.col("w"))
        .select("doc_id", "pos", "para")
    )
    kept = kept_dup.unionByName(ex.filter(F.col("para") == ""))
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n\n",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    n_paras = base.select(
        "doc_id", F.size(F.split(F.col("t"), "\n\n")).alias("n_paras")
    )
    return n_paras.join(agg, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped_paras"),
    )
