"""Deterministic synthetic corpus + docs-table generator (seed=42).

Schema follows BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Text payloads are drawn from the reference's own public test fixtures
(/root/reference/tests/detector_test.py:17-72, tests/test_file.txt,
pycorrector/data/sighan2015_test.tsv targets) so reference-semantics labels
are reproducible offline, per FIXTURES.md. Error docs are produced by
deterministically corrupting clean sentences with confusion variants and
similar-char swaps. Hosts follow a Zipf-ish distribution to exercise skew
salting.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .dicts import COMMON_WORDS_ZH, CONFUSION_DICT, SIMILAR_CHARS, WORDS_ZH

# -- clean zh sentences (reference fixture corpus; see module docstring) --
CLEAN_ZH = [
    "少先队员应该为老人让座",
    "你好！我是张爱文。",
    "下个星期，我跟我朋友打算去法国玩儿。",
    "我听说，你找到新工作，我很高兴。",
    "对不起，最近我很忙，所以我不会去你的。",
    "真麻烦你了。希望你们好好的跳舞。",
    "我本来要参加这个会的，可是我今天有一点儿事情一定要做完。",
    "所以我先去看医生，再去你的庆祝会。",
    "吃了早餐以后他去上课。",
    "走路差不多十分钟我们就到了。",
    "他知道今天，高中三年级的最后一天，是一个很重要的日子。",
    "一旦工作效率提升，需要时间在工作上也减少，足以照顾老人。",
    "一年又一年的过去，产龄妇女跟着变多，但婴儿的个数却是在慢慢的下降。",
    "相反的，生太多孩子的社会要有政府多鼓励少生孩子。",
    "这样一个家庭的费用会因为工作有限而减少。",
    "我的家乡是有名的鱼米之乡",
    "一只小渔船浮在平静的河面上",
    "美食美事皆不可辜负，这场盛会你一定期待已久",
    "中国人工智能布局很不错",
    "想不想再来一次比赛",
    "权力的游戏第八季",
    "这纸厚度如何？质量怎么样",
    "生产日期怎么样",
    "刚下单买了一箱，需要明天到货，先问下味道如何",
    "这个跟原木纯品那个啥区别？不是原木纸浆做的？",
    "不知这款牛奶口感怎样？小孩子喝行吗！",
    "我对于宠物出租的事非常认同，因为其实很多人喜欢宠物",
    "专业人士可以指导我们对于动物的习惯",
    "三个臭皮匠胜过一个诸葛亮也有道理。",
    "还有广告业是只要桌子前面坐着工作未必产生出来好的成果。",
    "语言模型可以用来检测文本质量",
    "数据处理系统需要高效率的分析能力",
]

# deterministic corruption rules: (clean substring -> corrupted substring)
# confusion-variant injections (reverse of CONFUSION_DICT truth->variant)
_CORRUPT_CONFUSION = [
    ("应该", "因该"),
    ("让座", "让坐"),
    ("兴高采烈", "兴高彩列"),
    ("化学成分", "化学成份"),
    ("人工智能", "人工只能"),
    ("权力的游戏", "权利的游戏"),
]
# similar-char swaps (clean char -> wrong char). For 净/笑/心 the wrong
# char is absent from the clean corpus, so the LM outlier stage flags it;
# 明/鱼/在 DO occur elsewhere in the corpus (in-vocab), so those
# corruptions exercise the word/ngram-context stages instead of the pure
# OOV path — both flag routes are covered on purpose
_CORRUPT_SIMCHAR = [
    ("平静", "平净"),
    ("有名", "有明"),
    ("渔船", "鱼船"),
    ("效率", "笑率"),
    ("新工作", "心工作"),
    ("再来一次", "在来一次"),
]

CLEAN_EN = [
    "the quick brown fox jumps over the lazy dog",
    "we can help you find new data about this query",
    "spark is a system for large scale data processing",
    "the table scan will filter rows by key and sort the order",
    "you can use the window group to merge small batch values",
    "this is the first view of the news from our customer",
    "see how the language model can correct the text quality",
    "poetry and bicycle are arranged in the correct order",
]

_CORRUPT_EN = [
    ("spelling", "speling"),
    ("corrected", "gorrectud"),
    ("bicycle", "bycycle"),
    ("inconvenient", "inconvient"),
    ("arranged", "arrainged"),
    ("poetry", "peotrry"),
    ("correct", "corect"),
    ("quality", "qualaty"),
]

JUNK_TEXTS = [" _ ,", "", "   ", "!!!???...", "####&&&&", "。。。，，，"]

# PII snippets for scrub coverage
PII_SNIPPETS = [
    "contact me at john.doe@example.com now",
    "visit https://tracking.example.com/p?id=123 for details",
    "call 555-0123-4567 today",
    "server at 192.168.10.25 responded",
]


def lm_corpus():
    """Training corpus for the char LM: all clean sentences, repeated to
    stabilize counts. Deterministic."""
    return (CLEAN_ZH * 8) + (CLEAN_EN * 4)


# ---------------------------------------------------------------------------
# Deterministic sentence POOLS for sf-scalable oracle queries.
#
# The synthetic documents table has no CJK text, and per-doc expected outputs
# of the detect/correct/segment operators are not SQL-expressible. The pool
# pattern solves both: a query reads doc_ids from {sf_dir} and maps
# doc_id % len(POOL) onto a fixed sentence pool, so (a) the input scales with
# the table, and (b) the DuckDB oracle can JOIN documents to a VALUES table
# of per-pool-index expected outputs precomputed by the same deterministic
# serial implementation. Every pool below is order-frozen: REORDERING OR
# EDITING entries invalidates committed oracle expectations only until the
# next oracle_sql() call (expectations are regenerated on the fly), but keep
# them stable so goldens in tests stay readable.
# ---------------------------------------------------------------------------

# proper-noun error sentences (zh_proper coverage; kept verbatim from the
# round-1 inline fixture so goldens carry over)
PROPER_SENTS = [
    "三个臭皮匠顶个诸葛两",
    "我们去北京看比赛",
    "他在上每工作了三年",
    "人工只能改变世界",
    "这是一段没有专名的话",
]


def _corrupt_each(sents, rules):
    """Apply every matching rule to every sentence (deterministic order)."""
    out = []
    for s in sents:
        for a, b in rules:
            if a in s:
                out.append(s.replace(a, b, 1))
    return out


ZH_POOL = (
    list(CLEAN_ZH)
    + _corrupt_each(CLEAN_ZH, _CORRUPT_CONFUSION)
    + _corrupt_each(CLEAN_ZH, _CORRUPT_SIMCHAR)
    + PROPER_SENTS
    + [t for t in JUNK_TEXTS if t]  # degenerate rows (detector_test.py:65 style)
)

# English sentences with injected typos (deterministic; en_spell coverage)
EN_TYPO_SENTS = [
    "i am lerning to use the speling checker",
    "the systim can corect this sentense quickly",
    "peotrry and bycycle are arrainged in the wrong ordr",
    "please chek the qualaty of the output text",
    "this line was gorrectud by the spell model",
    "no mistakes in this perfectly normal sentence",
]

EN_POOL = (
    list(CLEAN_EN)
    + _corrupt_each(CLEAN_EN, _CORRUPT_EN)
    + EN_TYPO_SENTS
)

# mixed pool for LM-perplexity / shingle-hash queries: zh + en + junk
PPL_POOL = list(CLEAN_ZH) + list(EN_POOL) + ["", "   ", "!!!???..."]

# traditional-Chinese pool (zh_t2s_phrase coverage): sentences embedding
# multi-char zh_wiki phrase keys (印表機/說明檔案/顯著/覆蓋/名畫/翻來覆去)
# plus plain traditional chars and one phrase-free line
ZHT_POOL = [
    "這裡的印表機壞了，請檢修",
    "請參閱說明檔案的第三章內容",
    "顯著的變化發生在這個系統",
    "白雪覆蓋了整座山頭",
    "博物館收藏了許多名畫",
    "他翻來覆去睡不著",
    "簡體與繁體轉換測試語句",
    "这是一段没有繁体字的话",
]

# simplified-Chinese pool (zh_s2t_phrase coverage): sentences embedding
# multi-char zh2Hant phrase keys (打印机/帮助文件/一只/一出/三国志) plus
# plain simplified chars and one conversion-free ASCII line
ZHS_POOL = [
    "办公室的打印机坏了，请尽快检修",
    "请先阅读帮助文件再安装软件",
    "树上有一只小鸟在唱歌",
    "他们连演了一出好戏",
    "我最喜欢读三国志这本书",
    "简体与繁体转换测试语句",
    "历史数据需要定期备份与归档",
    "plain ascii line with no chinese",
]

# minhash/shingle pool: multi-word English docs with near-dup structure
# (copies with one word swapped) plus one too-short doc (< k words) that
# must be DROPPED by the signature stage — the oracle mirrors the drop.
MINHASH_POOL = (
    list(CLEAN_EN)
    + [s.replace("the", "a", 1) for s in CLEAN_EN]
    + [s + " extra tail words here" for s in CLEAN_EN[:4]]
    + ["too short", ""]
)


def corrupt_sentence(sent: str, rng: np.random.Generator):
    """Apply the first matching corruption rule (deterministic given rng)."""
    rules = _CORRUPT_CONFUSION + _CORRUPT_SIMCHAR
    applicable = [(a, b) for a, b in rules if a in sent]
    if not applicable:
        return sent, False
    a, b = applicable[int(rng.integers(0, len(applicable)))]
    return sent.replace(a, b, 1), True


def corrupt_en(sent: str, rng: np.random.Generator):
    applicable = [(a, b) for a, b in _CORRUPT_EN if a in sent]
    if not applicable:
        return sent, False
    a, b = applicable[int(rng.integers(0, len(applicable)))]
    return sent.replace(a, b, 1), True


def zipf_hosts(n: int, rng: np.random.Generator, n_hosts: int = 64):
    """Zipf(1.2)-ish host ids in [0, n_hosts) — skew for salting tests."""
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()
    return rng.choice(n_hosts, size=n, p=probs)


def make_docs(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    """Deterministic docs table as pandas (written to parquet by callers)."""
    rng = np.random.default_rng(seed)
    hosts = zipf_hosts(n_docs, rng)
    base_ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    rows = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.05:
            # junk / degenerate rows (reference detector_test.py:65 style)
            text = JUNK_TEXTS[int(rng.integers(0, len(JUNK_TEXTS)))]
            lang = "zh"
        elif r < 0.75:
            # zh doc: 1-8 sentences, ~40% corrupted
            k = int(rng.integers(1, 9))
            sents = [CLEAN_ZH[int(rng.integers(0, len(CLEAN_ZH)))] for _ in range(k)]
            if rng.random() < 0.4:
                j = int(rng.integers(0, k))
                sents[j], _ = corrupt_sentence(sents[j], rng)
            text = "".join(sents)
            lang = "zh"
        else:
            k = int(rng.integers(1, 6))
            sents = [CLEAN_EN[int(rng.integers(0, len(CLEAN_EN)))] for _ in range(k)]
            if rng.random() < 0.4:
                j = int(rng.integers(0, k))
                sents[j], _ = corrupt_en(sents[j], rng)
            text = ". ".join(sents)
            lang = "en"
        # ~6% of rows get a PII snippet appended (scrub coverage)
        if rng.random() < 0.06 and text.strip():
            text = text + " " + PII_SNIPPETS[int(rng.integers(0, len(PII_SNIPPETS)))]
        # ~10% long docs (split/regroup coverage)
        if rng.random() < 0.10 and text.strip():
            text = text * int(np.ceil(600 / max(len(text), 1)))
        # ~2% wrong lang label (langid re-verification coverage)
        if rng.random() < 0.02:
            lang = "es"
        url = f"https://host{hosts[i]:02d}.example/{i}"
        rows.append({
            "url": url,
            "warc_ts": base_ts + dt.timedelta(seconds=17 * i),
            "html": b"<html><body>" + text.encode("utf-8") + b"</body></html>",
            "text": text,
            "lang": lang,
        })
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def word_freq_en():
    """English dict for the Norvig corrector: embedded frequencies plus
    every word of the clean fixture sentences (so clean docs are never
    'corrected')."""
    from .dicts import WORDS_EN

    wf = dict(WORDS_EN)
    for sent in CLEAN_EN:
        for w in sent.split():
            wf.setdefault(w, 1000)
    return wf


def word_freq_zh():
    """Word dict for segmentation + OOV detection: curated fixture words,
    the COMMON_WORDS_ZH public high-frequency vocabulary (round-5
    boundary-F1 closure; the reference's dict covers everyday words the
    90-entry fixture list missed), and every char of the clean corpus as
    a 1-char word (so only corrupted chars are OOV)."""
    wf = dict(WORDS_ZH)
    for w, c in COMMON_WORDS_ZH.items():
        wf.setdefault(w, c)
    for sent in CLEAN_ZH:
        for ch in sent:
            if "一" <= ch <= "龥":
                wf.setdefault(ch, 1)
    # truths of the confusion dict are legitimate words
    for truth in CONFUSION_DICT.values():
        wf.setdefault(truth, 100)
    return wf


# ---------------------------------------------------------------------------
# Scalar encodings for array-valued operator outputs.
#
# The driver's correctness canonicalizer sorts every output column and
# cannot hash list values ("unhashable type: list"), so queries emit arrays
# as pipe-joined scalar strings. These encoders are shared by the Spark
# query wrappers AND the driver-side oracle precompute, so both sides
# produce byte-identical strings by construction.
# ---------------------------------------------------------------------------


def fmt_tokens(tokens) -> str:
    """[(token, begin, end), ...] -> 'token:b:e|token:b:e'."""
    return "|".join(f"{t}:{int(b)}:{int(e)}" for t, b, e in tokens)


def fmt_detections(dets) -> str:
    """[[word, begin, end, type], ...] -> 'word:b:e:type|...'."""
    return "|".join(f"{w}:{int(b)}:{int(e)}:{ty}" for w, b, e, ty in dets)


def fmt_corrections(errs) -> str:
    """[(wrong, right, pos), ...] -> 'wrong>right:pos|...'."""
    return "|".join(f"{w}>{r}:{int(p)}" for w, r, p in errs)


def make_eval_pairs(n: int = 120, seed: int = 7) -> pd.DataFrame:
    """Deterministic (src, tgt) eval corpus (role of sighan2015_test.tsv,
    reference utils/evaluate_utils.py:32-39): tgt is a clean sentence,
    src is either the same (negative) or a corrupted variant (positive)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        tgt = CLEAN_ZH[i % len(CLEAN_ZH)]
        if rng.random() < 0.5:
            src, _ = corrupt_sentence(tgt, rng)
        else:
            src = tgt
        rows.append((src, tgt))
    return pd.DataFrame(rows, columns=["src", "tgt"])


def _mojibake(s: str, enc: str = "latin-1", times: int = 1) -> str:
    """Corrupt ``s`` the way real pipelines do: utf-8 bytes mis-decoded as
    a single-byte codepage, ``times`` generations deep."""
    for _ in range(times):
        s = s.encode("utf-8").decode(enc)
    return s


# encoding-repair pool: clean ASCII / clean accented / clean CJK text,
# single and double mojibake in latin-1 and cp1252 flavors, and a
# latin-1-native string that must pass through untouched
MOJIBAKE_POOL = [
    "plain ascii stays untouched",
    "café déjà vu — naïve façade",
    _mojibake("café déjà vu — naïve façade"),
    _mojibake("café déjà vu — naïve façade", times=2),
    _mojibake("smart “quote and – dash", enc="cp1252"),
    _mojibake("中文字符的编码损坏测试"),
    "中文字符未损坏",
    _mojibake("übergroße Straßenbahn"),
    "caf\xe9 already latin-1 native",  # not mojibake: must not change
    "",
]
