"""Embedded dimension dictionaries (broadcast inputs).

Small curated dictionaries playing the role of the reference's data files
(custom_confusion.txt, same_pinyin.txt, same_stroke.txt, word_freq,
stopwords, en.json.gz — formats documented in /root/reference/pycorrector/
detector.py:156-218, corrector.py:47-109, en_spell_corrector.py:44-56).
Contents are curated for the deterministic fixture corpus; at production
scale these load from files/tables on the driver and ship as broadcasts.
"""

from __future__ import annotations

# variant -> truth (format of reference tests/custom_confusion.txt)
CONFUSION_DICT = {
    "因该": "应该",
    "让坐": "让座",
    "兴高彩列": "兴高采烈",
    "化学成份": "化学成分",
    "满头大汉": "满头大汗",
    "称做": "称作",
    "人工只能": "人工智能",
    "权利的游戏": "权力的游戏",
    "名称权": "名誉权",
    "机七学习": "机器学习",
}
# NOTE: identity entries (variant == truth) are legal in the reference and
# produce detection hits but never corrections (corrector.py:312-315);
# covered by a unit test with a local dict rather than polluting the
# default error-density signal.

# similar-shape / same-pinyin chars, symmetric (same_pinyin/same_stroke role)
_SIM_GROUPS = [
    ("座", "坐", "做", "作"),
    ("的", "地", "得"),
    ("想", "像", "象"),
    ("在", "再"),
    ("以", "已"),
    ("新", "心", "信"),
    ("式", "是", "事", "市", "试"),
    ("净", "静", "竞"),
    ("明", "名", "鸣"),
    ("渔", "鱼", "余"),
    ("题", "提", "体"),
    ("氏", "士", "市"),
    ("采", "彩", "踩"),
    ("烈", "列", "裂"),
    ("汗", "汉", "旱"),
    ("分", "份", "氛"),
    ("机", "七", "器"),
    ("效", "笑", "校"),
    ("率", "绿", "律"),
    ("慢", "漫", "曼"),
    ("变", "便", "遍"),
]

SIMILAR_CHARS = {}
for group in _SIM_GROUPS:
    for ch in group:
        SIMILAR_CHARS.setdefault(ch, set()).update(c for c in group if c != ch)

# zh stopwords (never flagged as char errors; detector.py:466-468)
STOPWORDS_ZH = set("的了是我你他她它们在有和就不人都一上也很到要去会着对")

# multi-char zh words for the word dict (OOV detection surface);
# single chars of the clean corpus are added at fixture-build time.
WORDS_ZH = {
    "少先队员": 500, "应该": 800, "老人": 600, "让座": 300, "工作": 900,
    "效率": 400, "提升": 350, "时间": 700, "减少": 380, "照顾": 250,
    "兴高采烈": 120, "化学成分": 90, "人工智能": 260, "机器学习": 240,
    "权力": 200, "游戏": 420, "比赛": 310, "高兴": 520, "朋友": 610,
    "打算": 280, "法国": 150, "医生": 330, "庆祝": 140, "早餐": 170,
    "上课": 190, "重要": 360, "日子": 210, "婴儿": 130, "人口": 230,
    "妇女": 160, "慢慢": 180, "逐渐": 110, "数量": 140, "社会": 300,
    "政府": 270, "鼓励": 120, "孩子": 450, "家庭": 320, "费用": 130,
    "有名": 100, "鱼米之乡": 60, "家乡": 150, "平静": 130, "河面": 50,
    "宠物": 90, "出租": 110, "动物": 180, "了解": 260, "专业": 240,
    "人士": 130, "指导": 100, "习惯": 170, "诸葛亮": 40, "道理": 150,
    "皮匠": 30, "广告": 160, "桌子": 90, "成果": 110, "产生": 170,
    "质量": 200, "厚度": 60, "生产": 210, "日期": 150, "味道": 120,
    "一样": 340, "比较": 280, "好用": 90, "牛奶": 130, "口感": 70,
    "小孩": 160, "宝宝": 140, "驱蚊": 30, "下面": 120, "衣服": 190,
    "服装": 110, "语言": 170, "模型": 140, "检测": 120, "纠错": 80,
    "文本": 150, "数据": 260, "处理": 220, "系统": 240, "分析": 200,
}

# English unigram frequencies (role of reference en.json.gz, trimmed to the
# fixture vocabulary + Norvig test words, en_spell_corrector.py:44-56)
WORDS_EN = {
    "the": 23135851162, "of": 13151942776, "and": 12997637966, "to": 12136980858,
    "a": 9081174698, "in": 8469404971, "for": 5933321709, "is": 4705743816,
    "on": 3750423199, "that": 3400031103, "by": 3350048871, "this": 3228469771,
    "with": 3183110675, "i": 3086225277, "you": 2996181025, "it": 2813163874,
    "not": 2633487141, "or": 2590739907, "be": 2398724162, "are": 2393614870,
    "from": 2275595356, "at": 2272272772, "as": 2247431740, "your": 2062066547,
    "all": 2022459848, "have": 1564202750, "new": 1551258643, "more": 1544771673,
    "an": 1518266684, "was": 1483428678, "we": 1390661912, "will": 1356293641,
    "can": 1242323499, "us": 1229112622, "about": 1226734006, "if": 1134987907,
    "my": 1059793441, "has": 1046319984, "but": 1015783976, "our": 1005395776,
    "one": 992536818, "other": 923372979, "do": 920744765, "no": 903658114,
    "they": 857222195, "he": 846175696, "up": 829226368, "may": 827212682,
    "what": 812211450, "which": 810514085, "their": 782849411, "news": 755418298,
    "out": 741601852, "use": 719980257, "any": 710741293, "there": 701170205,
    "see": 681410380, "only": 657311755, "so": 655958571, "his": 645087568,
    "when": 638265261, "here": 637379665, "who": 630927278, "also": 616829904,
    "now": 611387736, "help": 607637107, "get": 605049436, "view": 602279334,
    "first": 578161543, "been": 575019382, "would": 572644147, "how": 571848080,
    "were": 570699558, "me": 566617666, "some": 545703047, "these": 541003982,
    "its": 525627757, "like": 520585287, "than": 512416113, "find": 507603080,
    "data": 300000000, "table": 150000000, "query": 80000000, "spark": 40000000,
    "scan": 30000000, "filter": 45000000, "join": 60000000, "sort": 35000000,
    "group": 120000000, "order": 180000000, "window": 70000000, "batch": 25000000,
    "row": 50000000, "value": 130000000, "key": 90000000, "hash": 20000000,
    "merge": 22000000, "part": 140000000, "line": 110000000, "customer": 65000000,
    "small": 95000000, "fast": 55000000, "slow": 18000000, "spelling": 8000000,
    "corrected": 5000000, "bicycle": 7000000, "inconvenient": 2000000,
    "arranged": 4000000, "poetry": 6000000, "correct": 12000000,
    "language": 35000000, "model": 42000000, "text": 88000000, "quality": 47000000,
    "need": 413228709, "want": 190210704, "make": 410438139, "good": 361211200,
    "time": 390441512, "work": 319071777, "well": 207717000, "very": 211268150,
    "just": 296158529, "over": 323670430, "most": 270106112, "after": 372948094,
}

# English misspelling -> custom forced fixes (en confusion dict role)
CONFUSION_EN = {
    "crossplatform": "cross-platform",
}

# toxicity/blocklist terms for the scrub stage (stand-in list; production
# would broadcast a curated lexicon)
BLOCKLIST_EN = ["badword1", "badword2", "offensiveterm"]

# traditional -> simplified single-char table (role of the reference's
# zh_wiki mapping consumed by langconv, utils/text_utils.py:93-108 — that
# table is ~8k entries loaded from a data file; this is a curated common
# subset, and the operator accepts a custom table for full coverage).
# Strictly 1-char -> 1-char so the default path is `str.translate` /
# SQL `translate` (codepoint map); multi-char phrases go through
# textops.longest_match_rewrite with a custom dict.
T2S_CHARS = {
    "萬": "万", "東": "东", "馬": "马", "鳥": "鸟", "龍": "龙", "華": "华",
    "愛": "爱", "國": "国", "學": "学", "習": "习", "體": "体", "醫": "医",
    "發": "发", "廣": "广", "場": "场", "買": "买", "賣": "卖", "車": "车",
    "書": "书", "語": "语", "說": "说", "讀": "读", "寫": "写", "聽": "听",
    "門": "门", "問": "问", "間": "间", "開": "开", "關": "关", "風": "风",
    "雲": "云", "電": "电", "氣": "气", "漢": "汉", "湯": "汤", "頭": "头",
    "點": "点", "黨": "党", "會": "会", "後": "后", "樂": "乐", "幾": "几",
    "機": "机", "飛": "飞", "錢": "钱", "長": "长", "張": "张", "見": "见",
    "貝": "贝", "頁": "页", "魚": "鱼", "絲": "丝", "紅": "红", "經": "经",
    "給": "给", "綠": "绿", "親": "亲", "舊": "旧", "時": "时", "實": "实",
    "對": "对", "來": "来", "為": "为", "無": "无", "數": "数", "這": "这",
    "個": "个", "們": "们", "從": "从", "眾": "众", "動": "动", "務": "务",
    "勞": "劳", "歷": "历", "麗": "丽", "禮": "礼", "藝": "艺", "術": "术",
    "戰": "战", "勝": "胜", "負": "负", "員": "员", "圓": "圆", "園": "园",
    "遠": "远", "運": "运", "過": "过", "還": "还", "進": "进", "連": "连",
    "週": "周", "陽": "阳", "陰": "阴", "雖": "虽", "離": "离", "難": "难",
    "鐵": "铁", "銀": "银", "錯": "错", "鍵": "键", "鎮": "镇", "際": "际",
    "與": "与", "當": "当", "應": "应", "條": "条", "統": "统", "計": "计",
}

# char -> toneless pinyin for the fixture vocabulary (role of the pinyin
# lib the reference queries in get_homophones_by_char/by_pinyin,
# utils/text_utils.py:111-137; production broadcasts the full table).
# Groups align with SIMILAR_CHARS so homophone recall covers the
# same-pinyin candidate machinery.
PINYIN_ZH = {
    "的": "de", "得": "de", "了": "le", "是": "shi", "式": "shi", "事": "shi",
    "市": "shi", "试": "shi", "士": "shi", "氏": "shi", "我": "wo", "你": "ni",
    "他": "ta", "她": "ta", "它": "ta", "们": "men", "在": "zai", "再": "zai",
    "有": "you", "和": "he", "就": "jiu", "不": "bu", "人": "ren", "都": "dou",
    "一": "yi", "以": "yi", "已": "yi", "上": "shang", "也": "ye", "很": "hen",
    "到": "dao", "道": "dao", "要": "yao", "去": "qu", "会": "hui", "着": "zhe",
    "对": "dui", "座": "zuo", "坐": "zuo", "做": "zuo", "作": "zuo",
    "想": "xiang", "像": "xiang", "象": "xiang", "新": "xin", "心": "xin",
    "信": "xin", "明": "ming", "名": "ming", "鸣": "ming", "渔": "yu",
    "鱼": "yu", "余": "yu", "题": "ti", "提": "ti", "体": "ti", "采": "cai",
    "彩": "cai", "踩": "cai", "烈": "lie", "列": "lie", "裂": "lie",
    "汗": "han", "汉": "han", "旱": "han", "分": "fen", "份": "fen",
    "氛": "fen", "机": "ji", "器": "qi", "七": "qi", "效": "xiao",
    "笑": "xiao", "校": "xiao", "率": "lv", "绿": "lv", "律": "lv",
    "慢": "man", "漫": "man", "曼": "man", "变": "bian", "便": "bian",
    "遍": "bian", "净": "jing", "静": "jing", "竞": "jing", "经": "jing",
    "诸": "zhu", "葛": "ge", "亮": "liang", "两": "liang", "凉": "liang",
    "北": "bei", "京": "jing", "海": "hai", "南": "nan", "马": "ma",
    "云": "yun", "学": "xue", "雪": "xue", "智": "zhi", "能": "neng",
    "志": "zhi", "只": "zhi", "朋": "peng", "鹏": "peng", "友": "you",
    "权": "quan", "利": "li", "力": "li", "游": "you", "戏": "xi",
    "称": "cheng",
}

# proper-noun dimension (role of person_name.txt/place_name.txt +
# custom proper-name files, proper_corrector.py:25-35; production stages
# 40k+ names and broadcasts the prebuilt index)
PROPER_NAMES = {
    "诸葛亮", "北京", "上海", "南京", "马云", "人工智能", "机器学习",
}

# char -> stroke-sequence code (role of pycorrector/data/stroke.txt read
# by load_dict_file, proper_corrector.py:38-59,72). Codes are over the
# h/s/p/n/z 5-stroke alphabet; visually-similar chars share long
# prefixes so 1 - normalized-Levenshtein over codes behaves like the
# reference's stroke similarity. Chars without an entry get a
# deterministic low-similarity fallback code (see refimpl/proper.py).
STROKE_CODES = {
    "亮": "pzhsnz", "两": "hspsps", "凉": "pzhsn",
    "学": "ppnzh", "雪": "hszhhh",
    "马": "znh", "鸟": "pznh",
    "云": "hhzn", "去": "hhzn",
    "京": "pzhsn", "景": "pzhsnh",
    "朋": "zhhzhh", "鹏": "zhhpznh",
    "智": "phzshh", "志": "hshzn",
}
