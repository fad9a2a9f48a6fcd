"""Proper-noun correction (reference ProperCorrector semantics).

Re-expresses /root/reference/pycorrector/proper_corrector.py:
- positional inverted indexes by word length over char / pinyin / stroke
  keys, built once (proper_corrector.py:73-86) — the v1.1.4 "~80x over
  full scan at 40k names" structure (README.md:46);
- candidate recall = bucket-intersection voting: a name is recalled when
  it matches the query on >= len-1 positions under any key family
  (get_candidate_names, proper_corrector.py:240-266);
- word similarity = max(stroke sim, pinyin sim); each is
  1 - normalized Levenshtein over the concatenated per-char codes, with
  the fuzzy-initial gate for pinyin (l/n, zh/z, ch/c, sh/s, eng/en,
  ing/in — proper_corrector.py:103-238);
- correct(): char n-grams len 2-4, exact dict hits skipped, best
  candidate above sim_threshold (default 0.85); overlapping corrections
  resolved by (len desc, score desc) span claiming, applied right to
  left (proper_corrector.py:268-348).

On Spark the built index is a driver-side object shipped via broadcast;
each executor probes it row-locally inside the Arrow-batched detect
stage (SURVEY.md §2.5 C5-C7). Dictionary data lives in dicts.py
(PINYIN_ZH / STROKE_CODES / PROPER_NAMES).
"""

from __future__ import annotations

from ..dicts import PINYIN_ZH, STROKE_CODES
from ..textops import is_cjk_string


def levenshtein(a: str, b: str) -> int:
    """Classic O(mn) edit distance (reference math_utils.py:82-125 —
    pinned to the DP form so scores never depend on an optional C ext)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def norm_sim(a: str, b: str) -> float:
    """1 - normalized Levenshtein (both empty -> 0, matching the
    reference's guard for missing code data)."""
    n = max(len(a), len(b))
    if n == 0:
        return 0.0
    return 1.0 - levenshtein(a, b) / n


_FUZZY_INITIALS = (("zh", "z"), ("ch", "c"), ("sh", "s"), ("n", "l"))
_FUZZY_FINALS = (("eng", "en"), ("ing", "in"))


def fuzzy_pinyin(py: str) -> str:
    """Normalize fuzzy initial/final pairs so e.g. zhang~zang, lin~ling
    compare equal (proper_corrector.py:159-183)."""
    for a, b in _FUZZY_INITIALS:
        if py.startswith(a):
            py = b + py[len(a):]
            break
    for a, b in _FUZZY_FINALS:
        if py.endswith(a):
            py = py[: -len(a)] + b
            break
    return py


def pinyin_of(ch: str, table: dict = None) -> str:
    """Toneless pinyin; chars outside the table fall back to the char
    itself repeated 4x. The fallback must be (a) collision-free — a
    modular code made unrelated out-of-table chars exact 'homophones' —
    and (b) MUTUALLY DISTANT under concatenation: a short or
    prefix-sharing code (e.g. hex codepoints 'q05801' vs 'q05802') lets
    the surrounding matched chars dilute one mismatched char's distance
    below the 0.85 rewrite threshold, force-rewriting unrelated text.
    ch*4 differs from every other char's code in all 4 positions and from
    every real pinyin/stroke string. (The reference's lazy_pinyin has
    full coverage; ours is a dim.)"""
    py = (PINYIN_ZH if table is None else table).get(ch)
    if py is not None:
        return py
    return ch * 4


def stroke_of(ch: str, table: dict = None) -> str:
    """Stroke code; out-of-table fallback = ch*4 (same collision/distance
    rationale as pinyin_of — the previous codepoint-mod-5 code collided
    for codepoints 2560 apart, scoring unrelated chars as identical)."""
    code = (STROKE_CODES if table is None else table).get(ch)
    if code is not None:
        return code
    return ch * 4


class ProperCorrector:
    """Positional-inverted-index proper-noun corrector.

    ``stroke_codes`` / ``pinyin_table`` inject reference-scale dimensions
    (dictio.full_dims: stroke.txt ~12k chars) in place of the embedded
    toys; None keeps the embedded dims."""

    def __init__(
        self,
        proper_names,
        sim_threshold: float = 0.85,
        min_word_len: int = 2,
        max_word_len: int = 4,
        stroke_codes: dict = None,
        pinyin_table: dict = None,
    ):
        self.names = set(proper_names)
        self.sim_threshold = sim_threshold
        self.min_word_len = min_word_len
        self.max_word_len = max_word_len
        self._stroke_table = stroke_codes
        self._pinyin_table = pinyin_table
        # three positional inverted indexes keyed (len, pos, key) -> names
        # (proper_corrector.py:73-86)
        self.index_char = {}
        self.index_pinyin = {}
        self.index_stroke = {}
        for name in self.names:
            ln = len(name)
            for pos, ch in enumerate(name):
                self.index_char.setdefault((ln, pos, ch), set()).add(name)
                self.index_pinyin.setdefault(
                    (ln, pos, fuzzy_pinyin(self._pinyin(ch))), set()
                ).add(name)
                self.index_stroke.setdefault((ln, pos, self._stroke(ch)), set()).add(name)
        # memo caches (proper_corrector.py:77-78, 88-101) — plain dicts;
        # bounded so a unique-n-gram stream cannot grow worker memory
        # without limit (same guard as EnSpellCorrector._CACHE_MAX).
        # NOTE: a broadcast ships whatever is in the caches at pickle
        # time (driver-side oracle precompute may have warmed them) —
        # harmless because every memoized value is a deterministic pure
        # function of the dims; keep it that way
        self._sim_cache = {}
        self._sim_cache_max = 200_000
        # candidate-recall memo: the same char n-grams recur across a web
        # corpus (profiled: vote counting over the positional buckets is
        # ~60% of cold correct() time at 58k names). Entries are name
        # LISTS (~92 avg / 411 max at 58k names), ~100x the footprint of
        # a sim-cache float, so the cap is 10x tighter — ~20k lists stay
        # in the tens of MB per worker instead of ~160 MB at the cap
        self._cand_cache = {}
        self._cand_cache_max = 20_000

    def _pinyin(self, ch: str) -> str:
        return pinyin_of(ch, self._pinyin_table)

    def _stroke(self, ch: str) -> str:
        return stroke_of(ch, self._stroke_table)

    # -- recall (proper_corrector.py:240-266) --

    def get_candidate_names(self, word: str):
        """Names of the same length matching >= len-1 positions under any
        key family, sorted by votes desc then name. Memoized per word."""
        hit = self._cand_cache.get(word)
        if hit is not None:
            return hit
        ln = len(word)
        votes = {}
        for pos, ch in enumerate(word):
            bucket = set()
            bucket |= self.index_char.get((ln, pos, ch), set())
            bucket |= self.index_pinyin.get((ln, pos, fuzzy_pinyin(self._pinyin(ch))), set())
            bucket |= self.index_stroke.get((ln, pos, self._stroke(ch)), set())
            for name in bucket:
                votes[name] = votes.get(name, 0) + 1
        min_votes = max(ln - 1, 1)
        cands = [(n, v) for n, v in votes.items() if v >= min_votes]
        cands.sort(key=lambda kv: (-kv[1], kv[0]))
        out = [n for n, _ in cands]
        if len(self._cand_cache) < self._cand_cache_max:
            self._cand_cache[word] = out
        return out

    # -- scoring (proper_corrector.py:103-238) --

    def char_sim(self, a: str, b: str) -> float:
        if a == b:
            return 1.0
        stroke = norm_sim(self._stroke(a), self._stroke(b))
        pinyin = norm_sim(fuzzy_pinyin(self._pinyin(a)), fuzzy_pinyin(self._pinyin(b)))
        return max(stroke, pinyin)

    def word_similarity(self, a: str, b: str) -> float:
        """max(stroke sim, pinyin sim) over the concatenated codes."""
        key = (a, b)
        hit = self._sim_cache.get(key)
        if hit is not None:
            return hit
        stroke = norm_sim("".join(self._stroke(c) for c in a), "".join(self._stroke(c) for c in b))
        pinyin = norm_sim(
            "".join(fuzzy_pinyin(self._pinyin(c)) for c in a),
            "".join(fuzzy_pinyin(self._pinyin(c)) for c in b),
        )
        sim = max(stroke, pinyin)
        if len(self._sim_cache) < self._sim_cache_max:
            self._sim_cache[key] = sim
        return sim

    # -- correction (proper_corrector.py:268-348) --

    def correct(self, sentence: str):
        """Return {'source','target','errors': [(wrong, right, begin), ...]}."""
        cand_spans = []
        n = len(sentence)
        for ln in range(self.min_word_len, self.max_word_len + 1):
            for i in range(n - ln + 1):
                gram = sentence[i: i + ln]
                if not is_cjk_string(gram):
                    continue
                if gram in self.names:  # exact hit: already proper
                    continue
                # best-SCORING candidate above threshold (vote order is a
                # recall ranking, not a similarity ranking — two names can
                # tie on votes with very different similarities)
                best = None
                for name in self.get_candidate_names(gram):
                    if name == gram:
                        continue
                    score = self.word_similarity(gram, name)
                    if score >= self.sim_threshold and (
                        best is None or score > best[4]
                    ):
                        best = (gram, name, i, ln, score)
                if best is not None:
                    cand_spans.append(best)
        # overlap resolution: (len desc, score desc), claim spans,
        # apply right-to-left so earlier indexes stay valid
        cand_spans.sort(key=lambda t: (-t[3], -t[4], t[2]))
        occupied = set()
        chosen = []
        for gram, name, i, ln, score in cand_spans:
            span = set(range(i, i + ln))
            if span & occupied:
                continue
            occupied |= span
            chosen.append((gram, name, i))
        target = sentence
        for gram, name, i in sorted(chosen, key=lambda t: -t[2]):
            target = target[:i] + name + target[i + len(gram):]
        details = sorted(
            [(g, nm, i) for g, nm, i in chosen if g != nm], key=lambda t: t[2]
        )
        return {"source": sentence, "target": target, "errors": details}
