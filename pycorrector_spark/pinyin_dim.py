"""Canonical char -> toneless-pinyin dimension, derived from PUBLIC data
shipped in every glibc install.

The reference uses pypinyin's ``lazy_pinyin`` — ONE canonical toneless
reading per char (reference corrector.py:154-161, proper_corrector.py:
159-183) — a dependency this sandbox does not have. The stand-ins so far
(same_pinyin reading SETS, dictio.pinyin_reading_map) over-admit
polyphones relative to that single-reading contract.

This module reconstructs a kMandarin-style single-reading table from two
public sources, with zero vendored char data:

1. ``/usr/share/i18n/locales/iso14651_t1_pinyin`` (glibc locale data,
   FSF-unencumbered per its header): ~25k hanzi listed in PINYIN
   COLLATION ORDER — every char of one toneless syllable is contiguous,
   syllable blocks follow one another, and each polyphone appears at ONE
   position (its canonical reading, the same collapse lazy_pinyin makes).
   The file carries no reading labels, only the order.
2. ``SYLLABLE_ANCHORS`` below: 2-6 anchor chars per syllable whose
   canonical reading is unambiguous general knowledge (monophones or
   tone-only polyphones). Anchors pin each syllable's block inside the
   ordered list; the table derives every other char's reading from
   position alone.

Derivation:
- anchors -> per-syllable position intervals; conflicting anchors
  (recall errors, canonical-reading surprises) are dropped by majority
  vote until intervals are pairwise disjoint;
- chars inside an interval get that syllable;
- chars in the GAP between consecutive intervals are resolved by voting
  over the reference's public same_pinyin.txt line structure (all chars
  on a line share the head's toneless reading): a gap char takes
  whichever neighbor syllable its same-reading-line peers were assigned;
  unresolved gap chars stay OUT of the table (consumers fall back to
  reading-set / embedded dims).

ü is spelled ``v`` (lv, nv, lve, nve), matching pypinyin's default
lazy_pinyin output.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

GLIBC_PINYIN_COLLATION = "/usr/share/i18n/locales/iso14651_t1_pinyin"

# syllable -> anchor chars (canonical toneless reading == the syllable).
# Chosen to avoid cross-syllable polyphones (长/会/重/还...); tone-only
# polyphones are fine. A wrong anchor is survivable: interval conflict
# resolution drops minority outliers.
SYLLABLE_ANCHORS = {
    "a": "阿啊", "ai": "爱哀矮碍", "an": "安岸案按", "ang": "昂肮盎",
    "ao": "奥傲袄", "ba": "八巴爸靶", "bai": "白百摆败", "ban": "班板办半",
    "bang": "帮棒榜绑", "bao": "包宝报抱", "bei": "北杯贝被", "ben": "本奔笨",
    "beng": "崩蹦迸", "bi": "比笔壁毕", "bian": "边变遍编", "biao": "表标彪",
    "bie": "别憋瘪", "bin": "宾滨彬", "bing": "兵冰病饼", "bo": "波玻博播",
    "bu": "不布步补", "ca": "擦", "cai": "才菜采猜", "can": "残惨灿餐",
    "cang": "仓苍舱", "cao": "草操糙", "ce": "策测册", "cen": "岑",
    "ceng": "层蹭", "cha": "茶叉插", "chai": "柴拆", "chan": "产缠铲",
    "chang": "昌常唱厂", "chao": "超吵抄", "che": "车彻撤",
    "chen": "陈尘晨沉", "cheng": "成城程诚", "chi": "吃迟池耻",
    "chong": "虫充崇", "chou": "抽愁丑筹", "chu": "出初楚除",
    "chuai": "揣", "chuan": "川船穿", "chuang": "床窗闯",
    "chui": "吹垂锤炊", "chun": "春纯唇蠢", "chuo": "戳",
    "ci": "词此次慈", "cong": "从聪葱丛", "cou": "凑", "cu": "粗醋促",
    "cuan": "窜蹿篡", "cui": "催脆翠崔", "cun": "村存寸",
    "cuo": "错措挫搓", "da": "搭达打", "dai": "带代戴袋",
    "dan": "但蛋丹淡", "dang": "当党荡档", "dao": "刀到道岛",
    "de": "德", "deng": "灯等登凳", "di": "低底滴弟",
    "dia": "嗲", "dian": "点电店典", "diao": "刁钓雕吊",
    "die": "跌爹叠蝶", "ding": "丁顶定订", "diu": "丢",
    "dong": "东冬动洞", "dou": "斗豆逗兜", "du": "读独堵毒",
    "duan": "端短段断", "dui": "对堆队", "dun": "顿吨蹲盾",
    "duo": "多朵躲夺", "e": "鹅饿额俄", "en": "恩", "er": "而二儿耳",
    "fa": "发法罚乏", "fan": "反饭凡烦", "fang": "方房放访",
    "fei": "飞非肥费", "fen": "分粉奋芬", "feng": "风封峰丰",
    "fo": "佛", "fou": "否", "fu": "夫福府父",
    "ga": "嘎尬", "gai": "该改概钙", "gan": "甘感赶肝",
    "gang": "钢刚港缸", "gao": "高告稿搞", "ge": "哥歌格各",
    "gen": "根跟", "geng": "更耕埂", "gong": "工公共功",
    "gou": "狗够沟购", "gu": "古故顾孤", "gua": "刮瓜挂寡",
    "guai": "怪乖拐", "guan": "关官管馆", "guang": "光广逛",
    "gui": "贵鬼规归", "gun": "滚棍", "guo": "锅国果裹",
    "ha": "哈", "hai": "海害孩骇", "han": "汉含寒喊",
    "hang": "航杭", "hao": "好号毫豪", "he": "喝河合贺",
    "hei": "黑嘿", "hen": "很恨狠痕", "heng": "横恒哼衡",
    "hong": "红洪轰宏", "hou": "后厚候猴", "hu": "湖呼虎户",
    "hua": "花话化滑", "huai": "坏怀淮槐", "huan": "欢换缓幻",
    "huang": "黄皇慌荒", "hui": "回灰挥毁", "hun": "婚魂昏",
    "huo": "火活或货", "ji": "鸡机急集", "jia": "家加甲嘉",
    "jian": "间见件建", "jiang": "江讲奖姜", "jiao": "交叫脚郊",
    "jie": "接街节姐", "jin": "金今近进", "jing": "京经精景",
    "jiong": "窘炯", "jiu": "九久酒旧", "ju": "句举巨局",
    "juan": "捐卷娟绢", "jue": "决绝爵掘", "jun": "军均君俊",
    "ka": "喀咔", "kai": "开凯慨", "kan": "看砍刊堪",
    "kang": "康抗炕", "kao": "考靠烤拷", "ke": "科可克课",
    "ken": "肯恳啃垦", "keng": "坑", "kong": "空孔恐控",
    "kou": "口扣寇", "ku": "哭苦库裤", "kua": "夸跨垮挎",
    "kuai": "快块筷", "kuan": "宽款", "kuang": "狂矿框筐",
    "kui": "亏愧奎葵", "kun": "昆困捆", "kuo": "阔扩廓",
    "la": "拉啦辣蜡", "lai": "来赖莱", "lan": "蓝兰烂懒",
    "lang": "狼浪郎朗", "lao": "老劳牢捞", "le": "乐",
    "lei": "雷泪类蕾", "leng": "冷愣", "li": "里力立理",
    "lian": "连联脸练", "liang": "良两亮凉", "liao": "料聊疗辽",
    "lie": "列烈猎裂", "lin": "林临邻淋", "ling": "另零铃灵",
    "liu": "留流刘柳", "long": "龙隆聋垄", "lou": "楼漏陋",
    "lu": "路鲁炉卢", "luan": "乱卵峦", "lun": "论轮伦",
    "luo": "罗锣骆裸", "lv": "旅律虑侣", "lve": "略掠",
    "ma": "妈马骂麻", "mai": "买卖麦迈", "man": "慢满蛮漫",
    "mang": "忙盲茫莽", "mao": "猫毛帽贸", "mei": "美每妹梅",
    "men": "门闷们", "meng": "梦猛盟萌", "mi": "米密迷蜜",
    "mian": "面棉免勉", "miao": "苗秒庙妙", "mie": "灭蔑",
    "min": "民敏闽悯", "ming": "名明命鸣", "miu": "谬",
    "mo": "摸墨莫膜", "mou": "谋某", "mu": "木母目墓",
    "na": "拿纳钠", "nai": "奶耐乃奈", "nan": "南难男",
    "nang": "囊", "nao": "脑闹恼挠", "nei": "内馁",
    "nen": "嫩", "neng": "能", "ni": "你泥尼逆",
    "nian": "年念捻碾", "niang": "娘酿", "niao": "鸟",
    "nie": "捏聂孽镊", "nin": "您", "ning": "宁凝柠",
    "niu": "牛扭纽妞", "nong": "农浓脓", "nu": "怒奴努",
    "nuan": "暖", "nuo": "挪诺糯懦", "nv": "女钕", "nve": "虐",
    "o": "噢", "ou": "欧偶呕藕", "pa": "怕爬帕趴",
    "pai": "拍牌排派", "pan": "盘判盼叛", "pang": "旁庞螃乓",
    "pao": "跑抛泡袍", "pei": "陪配佩培", "pen": "盆喷",
    "peng": "朋碰棚彭", "pi": "皮批匹脾", "pian": "片篇骗偏",
    "piao": "票飘漂瓢", "pie": "撇瞥", "pin": "拼品贫聘",
    "ping": "平瓶评凭", "po": "破坡婆泼", "pou": "剖",
    "pu": "普扑葡浦", "qi": "七起气器", "qia": "恰洽掐",
    "qian": "千前钱浅", "qiang": "枪墙抢腔", "qiao": "桥巧敲侨",
    "qie": "切且窃妾", "qin": "琴亲勤侵", "qing": "青请清情",
    "qiong": "穷琼", "qiu": "球秋求丘", "qu": "区去取趣",
    "quan": "全权劝泉", "que": "却确缺鹊", "qun": "群裙",
    "ran": "然染燃", "rang": "让嚷壤", "rao": "绕扰饶",
    "re": "热惹", "ren": "人任认忍", "reng": "仍扔",
    "ri": "日", "rong": "荣容融绒", "rou": "肉柔揉",
    "ru": "如入乳儒", "ruan": "软阮", "rui": "瑞锐蕊",
    "run": "润闰", "ruo": "弱若", "sa": "洒萨撒",
    "sai": "赛腮", "san": "三伞散", "sang": "桑嗓丧",
    "sao": "扫嫂骚", "se": "涩瑟", "sen": "森", "seng": "僧",
    "sha": "杀沙傻纱", "shai": "晒筛", "shan": "山闪衫删",
    "shang": "上商伤赏", "shao": "烧少绍哨", "she": "蛇舌射社",
    "shen": "深身神审", "sheng": "生声升胜", "shi": "十是时事",
    "shou": "手收首受", "shu": "书树叔舒", "shua": "刷耍",
    "shuai": "摔帅甩", "shuan": "拴栓涮", "shuang": "双爽霜",
    "shui": "水睡税", "shun": "顺瞬吮", "shuo": "硕朔说",
    "si": "四死思私", "song": "松送宋颂", "sou": "搜艘嗽",
    "su": "苏素速俗", "suan": "酸算蒜", "sui": "岁随虽碎",
    "sun": "孙损笋", "suo": "所锁索梭", "ta": "他她它塔",
    "tai": "太台态抬", "tan": "谈探叹滩", "tang": "糖汤堂躺",
    "tao": "讨套逃桃", "te": "特", "teng": "疼腾藤",
    "ti": "题体替踢", "tian": "天田甜填", "tiao": "条跳眺迢",
    "tie": "铁贴帖", "ting": "听停厅庭", "tong": "同通痛桶",
    "tou": "头投透偷", "tu": "图土兔突", "tuan": "团",
    "tui": "推腿退", "tun": "吞臀", "tuo": "托脱拖妥",
    "wa": "挖瓦袜娃", "wai": "外歪", "wan": "万完晚碗",
    "wang": "王忘望网", "wei": "为位未味", "wen": "文问闻温",
    "weng": "翁嗡瓮", "wo": "我握窝卧", "wu": "五无物武",
    "xi": "西细洗喜", "xia": "下夏虾峡", "xian": "先线现县",
    "xiang": "想向香箱", "xiao": "小笑消晓", "xie": "写谢些鞋",
    "xin": "心新信辛", "xing": "星形型姓", "xiong": "雄胸兄熊",
    "xiu": "修秀休袖", "xu": "需许续序", "xuan": "选宣悬玄",
    "xue": "学雪穴靴", "xun": "寻训讯迅", "ya": "牙压雅鸭",
    "yan": "烟眼言严", "yang": "羊样养阳", "yao": "药摇腰咬",
    "ye": "也夜业爷", "yi": "一以已意", "yin": "因音引印",
    "ying": "英影迎硬", "yong": "用永勇拥", "you": "友有又油",
    "yu": "鱼雨玉语", "yuan": "元员院远", "yue": "月越跃阅",
    "yun": "云运允孕", "za": "杂砸", "zai": "再在灾宰",
    "zan": "赞咱暂", "zang": "脏葬赃", "zao": "早造遭糟",
    "ze": "则责泽", "zei": "贼", "zen": "怎", "zeng": "增赠",
    "zha": "渣闸眨榨", "zhai": "窄债摘寨", "zhan": "站战展盏",
    "zhang": "张章掌丈", "zhao": "找照招罩", "zhe": "这者哲遮",
    "zhen": "真阵镇针", "zheng": "正整争政", "zhi": "之知直指",
    "zhong": "中钟众终", "zhou": "州周洲舟", "zhu": "猪主住竹",
    "zhua": "抓", "zhuai": "拽", "zhuan": "专砖",
    "zhuang": "装壮状庄", "zhui": "追坠锥缀", "zhun": "准谆",
    "zhuo": "桌捉浊卓", "zi": "字子自紫", "zong": "总宗纵踪",
    "zou": "走奏揍", "zu": "组族足租", "zuan": "攥",
    "zui": "嘴最罪醉", "zun": "尊遵", "zuo": "左做坐座",
}

# kMandarin-style hand supplements (public Unihan knowledge): chars of
# the reference's 3.5k common set the interval+gap method leaves
# unresolved, plus polyphones whose glibc-collation canonical reading
# differs from pypinyin lazy_pinyin's most-common choice (盛劲俩).
SUPPLEMENT = {
    "臊": "sao", "侧": "ce", "哟": "yo", "色": "se", "镣": "liao",
    "熏": "xun", "著": "zhu", "誊": "teng", "巷": "xiang", "眯": "mi",
    "觉": "jue", "猬": "wei", "么": "me", "檩": "lin", "抠": "kou",
    "骤": "zhou", "啰": "luo", "蓖": "bi", "哆": "duo", "呢": "ne",
    "倔": "jue", "痹": "bi", "垃": "la", "仑": "lun", "羡": "xian",
    "荸": "bi", "诀": "jue", "行": "xing", "给": "gei", "衩": "cha",
    "余": "yu", "蔫": "nian", "腌": "yan", "掂": "dian", "疟": "nve",
    "棱": "leng", "夯": "hang", "姊": "zi", "吭": "keng", "钻": "zuan",
    "铛": "dang", "涡": "wo", "抡": "lun", "憨": "han", "覆": "fu",
    "拓": "tuo", "掖": "ye", "谜": "mi", "掰": "bai", "碌": "lu",
    "盛": "sheng", "劲": "jin", "俩": "lia",
}

_ENTRY_RE = re.compile(r"^<U([0-9A-F]{4,5})> <U\1>;IGNORE;IGNORE;IGNORE")


@lru_cache(maxsize=None)
def ordered_hanzi(path: str = GLIBC_PINYIN_COLLATION) -> tuple:
    """Hanzi in pinyin collation order from the glibc locale file; empty
    tuple when the file is absent (consumers then fall back)."""
    if not os.path.exists(path):
        return ()
    out = []
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            m = _ENTRY_RE.match(line)
            if m:
                out.append(chr(int(m.group(1), 16)))
    return tuple(out)


def _resolve_intervals(pos: dict) -> list:
    """[(syllable, lo, hi)] sorted by lo, pairwise disjoint. Anchors that
    land inside another syllable's interval are dropped by majority vote
    (the syllable with more local anchors keeps its interval); iterated
    to a fixpoint."""
    hits = {}  # syl -> sorted positions of found anchors
    for syl, chars in SYLLABLE_ANCHORS.items():
        ps = sorted(pos[c] for c in chars if c in pos)
        if ps:
            hits[syl] = ps

    def conflicts(h):
        iv = sorted((ps[0], ps[-1], s) for s, ps in h.items())
        out = []
        for i in range(len(iv) - 1):
            if iv[i + 1][0] <= iv[i][1]:
                out.append((iv[i][2], iv[i + 1][2]))
        return out

    for _ in range(64):
        cf = conflicts(hits)
        if not cf:
            break
        a, b = cf[0]
        pa, pb = hits[a], hits[b]
        # the interval with FEWER anchors yields: drop its offending
        # endpoint(s); singleton-anchor syllables lose entirely
        loser, winner = (a, b) if len(pa) <= len(pb) else (b, a)
        lo, hi = hits[winner][0], hits[winner][-1]
        kept = [p for p in hits[loser] if p < lo or p > hi]
        # also trim the loser's endpoint that reaches into the winner
        if kept and len(kept) == len(hits[loser]):
            kept = kept[:-1] if loser == (a if pa[0] < pb[0] else b) else kept[1:]
        if kept:
            hits[loser] = kept
        else:
            del hits[loser]
    return sorted((ps[0], ps[-1], s) for s, ps in hits.items())


@lru_cache(maxsize=None)
def char_pinyin_table() -> dict:
    """char -> canonical toneless pinyin. Covers every hanzi inside an
    anchored interval plus gap chars resolvable through same_pinyin.txt
    co-occurrence; {} when the glibc collation file is absent."""
    chars = ordered_hanzi()
    if not chars:
        return {}
    pos = {c: i for i, c in enumerate(chars)}
    intervals = _resolve_intervals(pos)
    if not intervals:
        return {}

    table = {}
    for lo, hi, syl in intervals:
        for i in range(lo, hi + 1):
            table[chars[i]] = syl

    # ---- gap resolution via same_pinyin line structure ----
    try:
        from .dictio import load_same_pinyin_lines, _p

        lines = load_same_pinyin_lines(_p("same_pinyin.txt"))
    except Exception:
        lines = []
    if lines:
        # members of a line share the head's toneless reading; vote each
        # line's syllable from already-assigned members
        line_syl = []
        for head, same, diff in lines:
            votes = {}
            for c in {head} | set(same) | set(diff):
                s = table.get(c)
                if s:
                    votes[s] = votes.get(s, 0) + 1
            line_syl.append(max(votes, key=votes.get) if votes else None)
        char_lines = {}
        for i, (head, same, diff) in enumerate(lines):
            for c in {head} | set(same) | set(diff):
                char_lines.setdefault(c, []).append(i)
        # neighbor syllables of each gap: (left interval syl, right one)
        for gi in range(len(intervals) + 1):
            left = intervals[gi - 1] if gi > 0 else None
            right = intervals[gi] if gi < len(intervals) else None
            g_lo = (left[1] + 1) if left else 0
            g_hi = (right[0] - 1) if right else len(chars) - 1
            allowed = {s for s in
                       ((left[2] if left else None), (right[2] if right else None))
                       if s}
            for i in range(g_lo, g_hi + 1):
                c = chars[i]
                votes = {}
                for li in char_lines.get(c, ()):
                    s = line_syl[li]
                    if s in allowed:
                        votes[s] = votes.get(s, 0) + 1
                if votes:
                    table[c] = max(votes, key=votes.get)
    table.update(SUPPLEMENT)
    return table


def validation_report() -> dict:
    """Self-check numbers for tests: anchor retention after conflict
    resolution, table size, and agreement with same_pinyin.txt's line
    structure (same-tone members should share the head's reading; the
    residual disagreement is canonical-reading collapse of polyphones,
    exactly the divergence lazy_pinyin itself has)."""
    chars = ordered_hanzi()
    pos = {c: i for i, c in enumerate(chars)}
    intervals = _resolve_intervals(pos) if chars else []
    table = char_pinyin_table()
    n_anchor = sum(1 for cs in SYLLABLE_ANCHORS.values() for c in cs if c in pos)
    kept = set()
    for lo, hi, s in intervals:
        kept.add(s)
    agree = total = 0
    try:
        from .dictio import load_same_pinyin_lines, _p

        lines = load_same_pinyin_lines(_p("same_pinyin.txt"))
    except Exception:
        lines = []
    for head, same, diff in lines:
        hs = table.get(head)
        if not hs:
            continue
        for c in same:
            if c in table:
                total += 1
                agree += table[c] == hs
    return {
        "n_hanzi": len(chars),
        "n_anchors_found": n_anchor,
        "n_syllables_kept": len(kept),
        "n_syllables_total": len(SYLLABLE_ANCHORS),
        "table_size": len(table),
        "same_tone_agreement": (agree / total) if total else None,
    }
