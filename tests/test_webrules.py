"""Gopher repetition signals + C4 line filter (operators/webrules.py).

Hand-computed expectations on tiny synthetic pages; the sf-scale
Spark-vs-DuckDB value parity runs through the driver oracle gate
(qf_gopher_rules / qf_top_ngram / qf_c4_filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pycorrector_spark.operators.webrules import (
    BOILERPLATE_LINE,
    LINES_PER_PARA,
    WORDS_PER_LINE,
    top_ngram_frac,
    webpage_text_expr,
    with_c4_filter,
    with_gopher_columns,
    with_webpage_text,
)


def _page_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, page_text: string")


# ---------------------------------------------------------------------------
# page synthesis
# ---------------------------------------------------------------------------


def test_webpage_text_structure(spark):
    words = " ".join(f"w{i}" for i in range(25))  # 25 words -> 5 lines, 2 paras
    df = spark.createDataFrame([(0, words)], "doc_id: long, text: string")
    page = with_webpage_text(df).head().page_text
    paras = page.split("\n\n")
    lines = [ln for p in paras for ln in p.split("\n")]
    assert len(paras) == 2 and len(lines) == 5
    # doc 0, line 0: m=0 -> boilerplate; line 3: m=3 -> terminal '.'
    assert lines[0] == BOILERPLATE_LINE
    assert lines[3].endswith(".") and not lines[3].endswith("...")
    # line 5 of doc 0 (m=5): '...' suffix; line 4 (m=4): bullet
    assert lines[4].startswith("- ")
    # every non-boilerplate line carries <= WORDS_PER_LINE source words
    assert all(
        len(ln.lstrip("- ").rstrip(".").split(" ")) <= WORDS_PER_LINE
        for ln in lines[1:]
    )


def test_webpage_text_empty_and_null(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id: long, text: string")
    rows = {r.doc_id: r.page_text for r in with_webpage_text(df).collect()}
    assert rows == {1: "", 2: ""}


def test_webpage_text_deterministic(spark):
    df = spark.createDataFrame([(7, "a b c d e f g")], "doc_id: long, text: string")
    a = with_webpage_text(df).head().page_text
    b = with_webpage_text(df).head().page_text
    assert a == b and "\n" in a


# ---------------------------------------------------------------------------
# gopher signals
# ---------------------------------------------------------------------------


def test_gopher_dup_line_fracs(spark):
    # 4 lines, one exact duplicate pair of len 5 -> dup_line_frac = 1/4,
    # dup chars = 5 of 5+5+3+4 = 17
    page = "alpha\nalpha\nbee\nceed"
    r = with_gopher_columns(_page_df(spark, [(0, page)])).head()
    assert r.n_lines == 4
    assert r.dup_line_frac == pytest.approx(0.25)
    assert r.dup_line_char_frac == pytest.approx(5 / 17)
    assert r.dup_para_frac == 0.0


def test_gopher_dup_para_and_5gram(spark):
    para = "the cat sat on the mat"
    page = f"{para}\n\n{para}"
    r = with_gopher_columns(_page_df(spark, [(0, page)])).head()
    assert r.dup_para_frac == pytest.approx(0.5)
    # words = para twice (12 words) -> 8 5-grams; the repeated structure
    # gives duplicated grams
    assert r.dup_5gram_frac > 0.0
    assert r.stopword_hits == 1  # 'the' (distinct stopwords present, not occurrences)


def test_gopher_structure_fracs(spark):
    page = "- one bullet line\nplain line here\ntrails off...\nanother plain"
    r = with_gopher_columns(_page_df(spark, [(0, page)])).head()
    assert r.bullet_line_frac == pytest.approx(0.25)
    assert r.ellipsis_line_frac == pytest.approx(0.25)
    assert r.alpha_word_frac < 1.0  # the '-' token has no letter


def test_gopher_keep_flags(spark):
    good = (
        "the quick brown fox jumps over a lazy dog while nearby "
        "children play games in sunny parks and old friends share "
        "warm stories about distant travels"
    )
    bad = "spam spam\n" * 30  # massive line duplication
    rows = {
        r.doc_id: r
        for r in with_gopher_columns(
            _page_df(spark, [(0, good), (1, bad.strip())])
        ).collect()
    }
    assert rows[0].gopher_keep is True
    assert rows[1].gopher_keep is False and rows[1].dup_line_frac > 0.9


def test_gopher_empty_page(spark):
    r = with_gopher_columns(_page_df(spark, [(0, "")])).head()
    assert r.gw_words == 0 and r.gopher_keep is False
    assert r.dup_line_frac == 0.0 and r.mean_word_len == 0.0


# ---------------------------------------------------------------------------
# top n-gram
# ---------------------------------------------------------------------------


def test_top_ngram_basic(spark):
    # 'b c' occurs twice; total word chars = 7
    page = "a b c b c d"
    r = top_ngram_frac(_page_df(spark, [(0, page)]), n=2).head()
    assert r.top_gram == "b c" and r.top_cnt == 2
    assert r.top_ngram_char_frac == pytest.approx(2 * 2 / 6)


def test_top_ngram_tie_breaks_lexically(spark):
    r = top_ngram_frac(_page_df(spark, [(0, "z y x w")]), n=2).head()
    assert r.top_cnt == 1 and r.top_gram == "w"[0:0] + "x w"  # lexicographic min


def test_top_ngram_short_doc_absent(spark):
    out = top_ngram_frac(_page_df(spark, [(0, "solo"), (1, "a b")]), n=2)
    assert [r.doc_id for r in out.collect()] == [1]


def test_top_ngram_trigram(spark):
    r = top_ngram_frac(_page_df(spark, [(0, "a b c a b c")]), n=3).head()
    assert r.top_cnt == 2 and r.top_gram == "a b c"


# ---------------------------------------------------------------------------
# c4 filter
# ---------------------------------------------------------------------------


def test_c4_line_rules(spark):
    page = "\n".join(
        [
            "this line has enough words.",  # kept: 5 words + '.'
            "too short.",  # dropped: < 5 words
            "no terminal punctuation at all here",  # dropped: no punct
            "please enable javascript to continue browsing.",  # dropped: js
            "we use cookie banners on this site.",  # dropped: cookie
            "another good sentence with plenty of words!",  # kept
            'a quoted ending counts as terminal "',  # kept
        ]
    )
    r = with_c4_filter(_page_df(spark, [(0, page)])).head()
    assert r.c4_n_kept == 3
    assert r.c4_text.splitlines()[0] == "this line has enough words."
    assert r.c4_keep is True


def test_c4_doc_level_drop(spark):
    good_lines = "\n".join(["one fine sentence right here today."] * 3)
    page = good_lines + "\nlorem ipsum dolor sit amet."
    r = with_c4_filter(_page_df(spark, [(0, page)])).head()
    assert r.c4_keep is False  # lorem ipsum kills the doc
    assert r.c4_n_kept >= 3  # line-level retention still reported


def test_c4_min_kept_threshold(spark):
    page = "just one good long sentence here."
    r = with_c4_filter(_page_df(spark, [(0, page)])).head()
    assert r.c4_n_kept == 1 and r.c4_keep is False


def test_c4_empty(spark):
    r = with_c4_filter(_page_df(spark, [(0, "")])).head()
    assert r.c4_text == "" and r.c4_n_kept == 0 and r.c4_keep is False


# ---------------------------------------------------------------------------
# plan shape: signals stay codegen'd, no Python workers
# ---------------------------------------------------------------------------


def test_gopher_plan_has_no_python(spark):
    df = with_gopher_columns(_page_df(spark, [(0, "a b\nc d")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# corpus-frequency line dedup
# ---------------------------------------------------------------------------


def test_corpus_line_dedup_removes_shared_lines(spark):
    from pycorrector_spark.operators.webrules import corpus_line_dedup

    banner = "subscribe to our newsletter today"
    rows = [
        (i, f"unique line {i} alpha\n{banner}\n\nunique line {i} beta")
        for i in range(5)
    ] + [(99, "no banner here\n\njust text")]
    df = _page_df(spark, rows)
    out = {r.doc_id: r for r in corpus_line_dedup(df, max_line_df=3).collect()}
    for i in range(5):
        assert banner not in out[i].clean_text
        assert out[i].n_dropped_lines == 1
        # order + paragraph separators preserved
        assert out[i].clean_text == f"unique line {i} alpha\n\nunique line {i} beta"
    assert out[99].n_dropped_lines == 0
    assert out[99].clean_text == "no banner here\n\njust text"


def test_corpus_line_dedup_below_threshold_keeps_all(spark):
    from pycorrector_spark.operators.webrules import corpus_line_dedup

    rows = [(0, "shared line\nown line 0"), (1, "shared line\nown line 1")]
    out = corpus_line_dedup(_page_df(spark, rows), max_line_df=5).collect()
    assert all(r.n_dropped_lines == 0 for r in out)


# ---------------------------------------------------------------------------
# paragraph dedup (keep-first)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_keep_first(spark):
    from pycorrector_spark.operators.webrules import paragraph_dedup

    shared = "alpha beta\ngamma delta"
    rows = [
        (1, shared + "\n\n" + "unique one"),
        (2, "unique two" + "\n\n" + shared),
        (3, shared),
    ]
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(_page_df(spark, rows)).collect()
    }
    # doc 1 holds the global-min occurrence (doc_id=1, pos=0): keeps both
    assert out[1]["clean_text"] == shared + "\n\n" + "unique one"
    assert out[1]["n_dropped_paras"] == 0
    # later occurrences lose the shared paragraph, keep their unique content
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_dropped_paras"] == 1
    assert out[3]["clean_text"] == ""
    assert out[3]["n_dropped_paras"] == 1


def test_paragraph_dedup_within_doc_and_empty(spark):
    from pycorrector_spark.operators.webrules import paragraph_dedup

    rows = [
        (7, "same para\n\nsame para\n\ntail"),  # intra-doc dup: keep pos 0
        (8, ""),   # empty page survives untouched
        (9, None),  # NULL page -> ''
    ]
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(_page_df(spark, rows)).collect()
    }
    assert out[7]["clean_text"] == "same para\n\ntail"
    assert out[7]["n_dropped_paras"] == 1
    assert out[8]["clean_text"] == "" and out[8]["n_dropped_paras"] == 0
    assert out[9]["clean_text"] == "" and out[9]["n_dropped_paras"] == 0
