"""ProperCorrector (C5-C7), get_errors (C9), s2t (P7 inverse), and the
labeled-corpus eval harness (A5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pycorrector_spark.dicts import PROPER_NAMES
from pycorrector_spark.refimpl.core import Corrector, ErrorType, get_errors
from pycorrector_spark.refimpl.proper import (
    ProperCorrector,
    fuzzy_pinyin,
    levenshtein,
    norm_sim,
)
from pycorrector_spark.textops import s2t, t2s


@pytest.fixture(scope="module")
def pc():
    return ProperCorrector(PROPER_NAMES)


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "axc") == 1
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3


def test_norm_sim_bounds():
    assert norm_sim("", "") == 0.0
    assert norm_sim("ab", "ab") == 1.0
    assert 0.0 <= norm_sim("abcd", "wxyz") <= 1.0


def test_fuzzy_pinyin_pairs():
    assert fuzzy_pinyin("zhang") == fuzzy_pinyin("zang")
    assert fuzzy_pinyin("lin") == fuzzy_pinyin("ling")
    assert fuzzy_pinyin("neng") == fuzzy_pinyin("nen")
    assert fuzzy_pinyin("ni") == fuzzy_pinyin("li")
    assert fuzzy_pinyin("ma") == "ma"


def test_candidate_recall_len_minus_one(pc):
    # 3 of 4 positions exact + same-pinyin mismatch -> recalled
    assert "人工智能" in pc.get_candidate_names("人工只能")
    # same-pinyin last char of 3 -> recalled
    assert "诸葛亮" in pc.get_candidate_names("诸葛两")
    # wrong length -> never recalled
    assert pc.get_candidate_names("诸葛") == []


def test_proper_correct_same_pinyin(pc):
    res = pc.correct("三个臭皮匠顶个诸葛两")
    assert res["target"] == "三个臭皮匠顶个诸葛亮"
    assert res["errors"] == [("诸葛两", "诸葛亮", 7)]


def test_proper_exact_hit_untouched(pc):
    res = pc.correct("我们去北京看比赛")
    assert res["target"] == "我们去北京看比赛"
    assert res["errors"] == []


def test_proper_below_threshold_untouched(pc):
    # 每/海: different pinyin, no stroke entry -> sim below 0.85
    res = pc.correct("他在上每工作了三年")
    assert res["errors"] == []


def test_proper_overlap_longest_wins():
    pc2 = ProperCorrector({"诸葛亮", "诸葛"})
    res = pc2.correct("诸葛两出主意")
    # the 3-gram claims the span before the 2-gram can
    assert res["target"].startswith("诸葛亮")
    assert res["errors"] == [("诸葛两", "诸葛亮", 0)]


def test_detector_proper_stage(artifacts):
    zh = Corrector(
        lm=artifacts.lm,
        word_freq=artifacts.word_freq,
        confusion_dict={},
        stopwords=artifacts.stopwords,
        similar_chars={},
        enable_char_error=False,
        enable_word_error=False,
        proper=ProperCorrector(PROPER_NAMES),
    )
    dets = zh.detect("三个臭皮匠顶个诸葛两")
    assert [d for d in dets if d[3] == ErrorType.proper] == [
        ["诸葛两", 7, 10, ErrorType.proper]
    ]
    res = zh.correct("三个臭皮匠顶个诸葛两")
    assert res["target"] == "三个臭皮匠顶个诸葛亮"
    assert ("诸葛两", "诸葛亮", 7) in res["errors"]


def test_get_errors_reference_contract():
    """Per-char triples + (new_corrected_text, errors) two-value return —
    the reference error_utils.get_errors contract."""
    from pycorrector_spark.refimpl.core import get_segment_errors

    new_text, errs = get_errors("兴高采烈去北京", "兴高彩列去北京")
    assert new_text == "兴高采烈去北京"
    assert errs == [("彩", "采", 2), ("列", "烈", 3)]
    assert get_errors("abc", "abc") == ("abc", [])
    # unk tokens (space) skipped per char; insert of space not recorded
    assert get_errors("a bc", "abc") == ("a bc", [])
    # delete: origin char dropped from output, recorded with empty repl
    assert get_errors("ac", "abc") == ("ac", [("b", "", 1)])
    # segment-level variant keeps the round-1 coarser shape
    assert get_segment_errors("兴高采烈去北京", "兴高彩列去北京") == [("彩列", "采烈", 2)]


def test_t2s_s2t_roundtrip():
    assert s2t(t2s("東風")) == "東風"
    assert t2s(s2t("东风")) == "东风"


def test_eval_harness_metrics(spark):
    from pycorrector_spark.evaluate import eval_corrector
    from pycorrector_spark.fixtures import make_eval_pairs

    pairs_pdf = make_eval_pairs()
    row = eval_corrector(spark, spark.createDataFrame(pairs_pdf)).first()
    assert row["n"] == len(pairs_pdf)
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == row["n"]
    n_pos = int((pairs_pdf["src"] != pairs_pdf["tgt"]).sum())
    assert row["tp"] + row["fn"] == n_pos
    # the corrector was built for exactly these corruption rules: the
    # fixture F1 gate mirrors the reference's eval_model_batch flow
    assert row["f1"] >= 0.9
    assert 0.0 <= row["acc"] <= 1.0


def test_stroke_fallback_collision_free():
    """Regression: the old codepoint-mod-5 stroke fallback collided for
    codepoints 2560 apart (e.g. 堁堂 vs 丁丂 scored similarity 1.0),
    force-rewriting unrelated out-of-table text into proper names."""
    from pycorrector_spark.refimpl.proper import ProperCorrector, stroke_of

    assert stroke_of("堁", {}) != stroke_of("丁", {})
    assert stroke_of("堂", {}) != stroke_of("丂", {})
    pc = ProperCorrector({"丁丂"})
    assert pc.correct("前缀堁堂后缀")["errors"] == []


def test_en_index_matches_norvig_on_nonletter_dict_words():
    """Regression: the deletes index suggested dict words the Norvig
    edits (inserts/replaces from a-z only) can never produce — outputs
    diverged depending on whether the index was attached."""
    from pycorrector_spark.refimpl.core import EnSpellCorrector
    from pycorrector_spark.symspell import DeletesIndex

    wf = {"don't": 100, "dont": 0, "front": 50}
    plain = EnSpellCorrector({k: v for k, v in wf.items() if v > 0})
    indexed = EnSpellCorrector(
        {k: v for k, v in wf.items() if v > 0},
        index=DeletesIndex(sorted(k for k, v in wf.items() if v > 0)),
    )
    # "don't" needs an apostrophe insert — unreachable for Norvig, so the
    # indexed path must not suggest it either
    assert plain.correct_word("dont") == indexed.correct_word("dont")


def test_en_fast_path_respects_include_symbol():
    from pycorrector_spark.refimpl.core import EnSpellCorrector

    en = EnSpellCorrector({"hello": 10, "world": 10})
    # include_symbol=False strips symbol fragments — the output shape must
    # not depend on whether a correction happened to be needed
    clean = en.correct("hello, world!", include_symbol=False)
    assert clean["target"] == "helloworld"
    fixed = en.correct("helo, world!", include_symbol=False)
    assert fixed["target"] == "helloworld"
