"""POS-tag fidelity measurement (round-4 verdict ask #7), the same
methodology as tests/test_segment_agreement.py: jieba's posseg is not
installed in this sandbox, so the comparison target is RECORDED_POSSEG —
a hand-recorded transcript of jieba posseg precise-mode output written
from public knowledge of the ICTCLAS/jieba tag set. It is an
approximation: individual tags may differ from a live posseg run, so the
assertions are a conservative FLOOR plus printed measurements.

Metrics, over tokens whose (start, end) span matches between the repo's
segment_pos output and the transcript:
- exact tag accuracy (uj == uj)
- coarse accuracy (first letter: u* ~ u*, n* ~ n*) — the granularity the
  reference pipeline actually consumes (tokenizer.py tags feed only
  coarse word-class decisions downstream).
"""

import pytest

# sentence -> "token/tag token/tag ..." (posseg transcript; punctuation x)
RECORDED_POSSEG = {
    "少先队员应该为老人让座":
        "少先队员/n 应该/v 为/p 老人/n 让座/v",
    "你好！我是张爱文。":
        "你好/l ！/x 我/r 是/v 张爱文/nr 。/x",
    "我听说，你找到新工作，我很高兴。":
        "我/r 听说/v ，/x 你/r 找到/v 新/a 工作/vn ，/x 我/r 很/d 高兴/a 。/x",
    "吃了早餐以后他去上课。":
        "吃/v 了/ul 早餐/n 以后/f 他/r 去/v 上课/v 。/x",
    "走路差不多十分钟我们就到了。":
        "走路/v 差不多/l 十分钟/m 我们/r 就/d 到/v 了/ul 。/x",
    "他知道今天，高中三年级的最后一天，是一个很重要的日子。":
        "他/r 知道/v 今天/t ，/x 高中/n 三年级/m 的/uj 最后/f 一天/m ，/x"
        " 是/v 一个/m 很/d 重要/a 的/uj 日子/n 。/x",
    "语言模型可以用来检测文本质量":
        "语言/n 模型/n 可以/v 用来/v 检测/v 文本/n 质量/n",
    "中国人工智能布局很不错":
        "中国/ns 人工智能/n 布局/n 很/d 不错/a",
    "我对于宠物出租的事非常认同，因为其实很多人喜欢宠物":
        "我/r 对于/p 宠物/n 出租/vn 的/uj 事/n 非常/d 认同/v ，/x"
        " 因为/c 其实/d 很多/m 人/n 喜欢/v 宠物/n",
    "专业人士可以指导我们对于动物的习惯":
        "专业人士/n 可以/v 指导/v 我们/r 对于/p 动物/n 的/uj 习惯/n",
    "一旦工作效率提升，需要时间在工作上也减少，足以照顾老人。":
        "一旦/c 工作效率/n 提升/v ，/x 需要/v 时间/n 在/p 工作/vn 上/f"
        " 也/d 减少/v ，/x 足以/v 照顾/v 老人/n 。/x",
    "这样一个家庭的费用会因为工作有限而减少。":
        "这样/r 一个/m 家庭/n 的/uj 费用/n 会/v 因为/c 工作/vn 有限/a"
        " 而/c 减少/v 。/x",
}


def _spans(pairs):
    out, pos = {}, 0
    for tok, tag in pairs:
        out[(pos, pos + len(tok))] = (tok, tag)
        pos += len(tok)
    return out


def test_pos_tag_agreement_vs_recorded_posseg():
    from pycorrector_spark.operators.score import default_artifacts
    from pycorrector_spark.textops import segment_pos

    art = default_artifacts()
    wf = art.word_freq
    total = sum(wf.values())

    n_aligned = n_exact = n_coarse = n_tokens_ref = 0
    diverge = []
    for sent, ref in RECORDED_POSSEG.items():
        ref_pairs = [p.rsplit("/", 1) for p in ref.split()]
        assert "".join(t for t, _ in ref_pairs) == sent, f"broken: {sent!r}"
        n_tokens_ref += len(ref_pairs)
        got = segment_pos(sent, wf, total)
        got_spans = _spans([(t, f) for t, _b, _e, f in got])
        for span, (tok, rtag) in _spans(ref_pairs).items():
            if span not in got_spans:
                continue  # segmentation divergence, scored in the seg test
            n_aligned += 1
            gtag = got_spans[span][1]
            if gtag == rtag:
                n_exact += 1
            if gtag[:1] == rtag[:1]:
                n_coarse += 1
            elif len(diverge) < 8:
                diverge.append((tok, gtag, rtag))
    exact = n_exact / n_aligned
    coarse = n_coarse / n_aligned
    aligned_rate = n_aligned / n_tokens_ref
    print(
        f"POS_AGREEMENT aligned={n_aligned}/{n_tokens_ref} "
        f"({aligned_rate:.3f}) exact_tag_acc={exact:.4f} "
        f"coarse_tag_acc={coarse:.4f}"
    )
    for d in diverge:
        print("  TAG_DIVERGE", d)
    # enough tokens must align for the tag metric to mean anything
    assert aligned_rate >= 0.8, aligned_rate
    # conservative floors; the printed measurement is the deliverable
    assert coarse >= 0.80, coarse
    assert exact >= 0.70, exact


def test_pos_groups_have_no_conflicting_duplicates():
    """A word listed under two tags would silently take the later tag —
    make the table unambiguous by construction."""
    from pycorrector_spark.dicts import _POS_GROUPS_ZH

    seen = {}
    for tag, words in _POS_GROUPS_ZH.items():
        for w in words.split():
            assert w not in seen, f"{w!r} tagged both {seen[w]} and {tag}"
            seen[w] = tag
