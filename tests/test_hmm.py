"""HMM finalseg (jieba cut(HMM=True) parity): BMES viterbi over OOV
single-char runs — algorithm replicated from jieba's public finalseg,
tables derived deterministically from the word-freq dict (the documented
divergence; jieba's corpus-trained data files are absent in-sandbox).
Reference call site: utils/tokenizer.py:100-127."""

import pytest

from pycorrector_spark.fixtures import CLEAN_ZH, ZH_POOL
from pycorrector_spark.textops import (
    dag_hmm_tokens,
    dag_max_prob_tokens,
    hmm_cut_spans,
    hmm_tables_from_freq,
    viterbi_bmes,
)


@pytest.fixture(scope="module")
def wf():
    from pycorrector_spark.operators.score import default_artifacts

    return default_artifacts().word_freq


@pytest.fixture(scope="module")
def tables(wf):
    return hmm_tables_from_freq(wf)


def test_tables_deterministic(wf):
    a = hmm_tables_from_freq(wf)
    b = hmm_tables_from_freq(dict(wf))
    assert a == b


def test_viterbi_states_legal(tables):
    start, trans, emit = tables
    for s in ["少先队员", "王晓明", "新安江水库"]:
        _, states = viterbi_bmes(s, start, trans, emit)
        assert len(states) == len(s)
        # word-shape grammar: B(M*)E runs and S singles only
        import re

        assert re.fullmatch(r"(BM*E|S)+", states), states


def test_span_invariants(wf, tables):
    for s in ZH_POOL:
        toks = dag_hmm_tokens(s, wf, tables=tables)
        assert "".join(t for t, _, _ in toks) == s
        assert all(s[b:e] == t for t, b, e in toks)


def test_oov_runs_join(wf, tables):
    # 新安江 is not in the dict: without HMM it shatters to single chars,
    # with HMM the BMES pass joins the unseen span into multi-char tokens
    s = "王晓明去了新安江水库"
    nohmm = [t for t, _, _ in dag_max_prob_tokens(s, wf)]
    hmm = [t for t, _, _ in dag_hmm_tokens(s, wf, tables=tables)]
    assert "新" in nohmm and "安" in nohmm and "江" in nohmm
    assert not {"新", "安", "江"} & set(hmm)
    assert max(len(t) for t in hmm if "新" in t or "安" in t) >= 2


def test_alnum_runs_kept_whole(wf, tables):
    toks = [t for t, _, _ in dag_hmm_tokens("版本v2更新abc123完成", wf, tables=tables)]
    assert "abc123" in toks


def test_in_dict_words_never_resplit(wf, tables):
    # a buffered single-char run that IS a dict word is emitted per char
    # (jieba __cut_DAG behavior), and multi-char dict words bypass the
    # buffer entirely — so dict words never reach the viterbi
    for s in CLEAN_ZH[:8]:
        toks = dag_hmm_tokens(s, wf, tables=tables)
        for t, b, e in toks:
            if len(t) >= 2 and t not in wf:
                # any multi-char token NOT in the dict must come from an
                # OOV run the viterbi joined (never from splitting a word)
                base = dag_max_prob_tokens(s, wf)
                covered = [w for w, bb, ee in base if bb >= b and ee <= e]
                assert all(len(w) == 1 for w in covered)


def test_multichar_dict_words_survive_hmm(wf, tables):
    """Structural jieba parity: multi-char DAG tokens (dict words) are
    emitted before the buffer flush, so the HMM stage can NEVER change
    them — every multi-char token of the no-HMM cut must appear at the
    same span in the HMM cut. (Token-set agreement on this fixture dict
    is only ~0.46: the dict registers most chars as 1-char words, so
    clean sentences buffer into long runs the viterbi merges — that is
    dict-CONTENT divergence from jieba's 350k-entry dict, the documented
    sandbox gap, not an algorithm difference.)"""
    total = 0
    same = 0
    for s in CLEAN_ZH:
        a = dag_max_prob_tokens(s, wf)
        b = set(dag_hmm_tokens(s, wf, tables=tables))
        multi = [t for t in a if len(t[0]) > 1]
        assert all(t in b for t in multi), (s, multi)
        sa = set(a)
        total += len(sa | b)
        same += len(sa & b)
    agreement = same / total
    # recorded metric (see docstring): bound guards against regressions
    assert agreement >= 0.40, f"clean-text token agreement {agreement:.3f}"


def test_hmm_cut_spans_mixed_block(tables):
    out = hmm_cut_spans("abc123，汉字块", tables)
    text = "abc123，汉字块"
    assert "".join(t for t, _, _ in out) == text
    assert all(text[b:e] == t for t, b, e in out)
    assert out[0][0] == "abc123"
    assert out[1][0] == "，"
