"""Backoff character n-gram language model with a vectorized scorer.

Re-expresses the KenLM query semantics the reference relies on
(/root/reference/pycorrector/detector.py:268-284, tests/kenlm_test.py):

- ``score(tokens, bos, eos)`` = sum of log10 P(w_i | longest seen context)
  with ARPA backoff: unseen n-gram -> backoff_weight(context) + P(w | shorter).
- ``perplexity(tokens)`` = 10 ** (-score(tokens, bos=True, eos=True) /
  (len(tokens) + 1)) — the +1 counts </s> (kenlm full_scores yields len+1
  entries, reference tests/kenlm_test.py:46-49).
- the detector's windowed 2/3-gram scoring (detector.py:441-461) is computed
  here via the algebraic identity
      score(s[i:i+n], bos=False, eos=False)
        = uni(s[i]) + cond2(s[i+1]) [+ cond3(s[i+2])]
  which turns O(len * n) LM probes into three vectorized probe arrays.

KenLM itself is unavailable in this environment, so the model is trained
from the deterministic fixture corpus with absolute-discount backoff
smoothing (Katz/ARPA style). Both the serial reference oracle and the
Spark pandas-UDF stages score with THIS class, so their floats are
bitwise identical by construction.

Storage: flat sorted int64 key arrays + float64 value arrays, probed with
``np.searchsorted`` — no per-row Python in the hot path; broadcast-friendly
(a plain picklable object of numpy arrays).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

LOG10_EPS = -99.0  # ARPA convention for "effectively zero"
DISCOUNT = 0.5     # absolute discount mass moved to backoff


def _pack2(a, b, base):
    return a * base + b


def _pack3(a, b, c, base):
    return (a * base + b) * base + c


class CharNgramLM:
    """Order-3 backoff char LM over int-encoded characters.

    Special ids: unk=0, bos=1, eos=2; real chars start at 3.
    """

    def __init__(self, vocab, p1, bow1, keys2, p2, bow2, keys3, p3):
        self.vocab = vocab                      # dict char -> id (>=3)
        self.base = len(vocab) + 3
        self.p1 = p1                            # float64 [base]
        self.bow1 = bow1                        # float64 [base]
        self.keys2 = keys2                      # sorted int64
        self.p2 = p2
        self.bow2 = bow2
        self.keys3 = keys3                      # sorted int64
        self.p3 = p3
        # fast char->id for vectorized encode
        max_cp = max((ord(c) for c in vocab), default=0)
        self._cp_map = np.zeros(max_cp + 2, dtype=np.int32)  # default unk=0
        for ch, i in vocab.items():
            self._cp_map[ord(ch)] = i

    # ---------------- encoding ----------------

    def encode(self, text: str) -> np.ndarray:
        """char ids (unk for OOV) as int64 array."""
        if not text:
            return np.empty(0, dtype=np.int64)
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        ids = np.where(cps < len(self._cp_map), self._cp_map[np.minimum(cps, len(self._cp_map) - 1)], 0)
        return ids.astype(np.int64)

    # ---------------- probes (vectorized) ----------------

    def _probe(self, keys_sorted, values, query, default):
        """values[query] where present else default. Fully vectorized."""
        if len(keys_sorted) == 0:
            return np.full(len(query), default, dtype=np.float64)
        pos = np.searchsorted(keys_sorted, query)
        pos_c = np.minimum(pos, len(keys_sorted) - 1)
        hit = keys_sorted[pos_c] == query
        out = np.where(hit, values[pos_c], default)
        return out

    def uni(self, w: np.ndarray) -> np.ndarray:
        return self.p1[w]

    def cond2(self, v: np.ndarray, w: np.ndarray) -> np.ndarray:
        """log10 P(w | v) with backoff."""
        q = _pack2(v, w, self.base)
        p = self._probe(self.keys2, self.p2, q, np.nan)
        backed = self.bow1[v] + self.p1[w]
        return np.where(np.isnan(p), backed, p)

    def cond3(self, u: np.ndarray, v: np.ndarray, w: np.ndarray) -> np.ndarray:
        """log10 P(w | u v) with recursive backoff."""
        q3 = _pack3(u, v, w, self.base)
        p = self._probe(self.keys3, self.p3, q3, np.nan)
        bow_uv = self._probe(self.keys2, self.bow2, _pack2(u, v, self.base), 0.0)
        backed = bow_uv + self.cond2(v, w)
        return np.where(np.isnan(p), backed, p)

    # ---------------- kenlm-equivalent API ----------------

    def score_ids(self, ids: np.ndarray, bos: bool, eos: bool) -> float:
        """Sum of per-token conditional log10 probs (kenlm Model.score)."""
        seq = ids
        if bos:
            seq = np.concatenate(([np.int64(1)], seq))
        if eos:
            seq = np.concatenate((seq, [np.int64(2)]))
        start = 1 if bos else 0
        n = len(seq)
        if n - start <= 0:
            return 0.0
        total = 0.0
        # position start scored with no context unless bos gave one
        pos = np.arange(start, n)
        # gather context ids
        w = seq[pos]
        v = np.where(pos - 1 >= 0, seq[np.maximum(pos - 1, 0)], -1)
        u = np.where(pos - 2 >= 0, seq[np.maximum(pos - 2, 0)], -1)
        out = np.empty(len(pos), dtype=np.float64)
        m_uni = v < 0
        m_bi = (~m_uni) & (u < 0)
        m_tri = ~(m_uni | m_bi)
        if m_uni.any():
            out[m_uni] = self.uni(w[m_uni])
        if m_bi.any():
            out[m_bi] = self.cond2(v[m_bi], w[m_bi])
        if m_tri.any():
            out[m_tri] = self.cond3(u[m_tri], v[m_tri], w[m_tri])
        total = float(np.sum(out))
        return total

    def score_chars(self, chars, bos: bool = False, eos: bool = False) -> float:
        """Score a char-token sequence (list of single chars or a string)."""
        text = "".join(chars)
        return self.score_ids(self.encode(text), bos, eos)

    def perplexity_chars(self, chars) -> float:
        """kenlm Model.perplexity over char tokens.

        Routed through ``ppl_batch`` so scalar and batched calls produce
        bitwise-identical float64 results (same summation order).
        """
        return float(self.ppl_batch(["".join(chars)])[0])

    def ppl_batch(self, texts) -> np.ndarray:
        """Vectorized perplexity over many strings (one flat probe pass).

        Bitwise-identical to ``perplexity_chars`` per row: the per-position
        conditionals are computed by the same probe functions and summed
        per sentence with np.add.reduceat (same pairwise order as the
        np.sum over one sentence's positions).
        """
        if len(texts) == 0:
            return np.empty(0, dtype=np.float64)
        encs = [self.encode(t) for t in texts]
        lens = np.array([len(e) for e in encs], dtype=np.int64)
        # build flat sequence [bos] ids [eos] per sentence
        parts = []
        for e in encs:
            parts.append(np.concatenate(([np.int64(1)], e, [np.int64(2)])))
        flat = np.concatenate(parts)
        seq_lens = lens + 2
        starts = np.concatenate(([0], np.cumsum(seq_lens)[:-1]))
        # positions to score: all except the bos at each start
        total_pos = int(np.sum(seq_lens - 1))
        pos = np.empty(total_pos, dtype=np.int64)
        row = np.empty(total_pos, dtype=np.int64)
        o = 0
        for r, (s, L) in enumerate(zip(starts, seq_lens)):
            k = L - 1
            pos[o: o + k] = np.arange(s + 1, s + L)
            row[o: o + k] = r
            o += k
        w = flat[pos]
        local = pos - starts[row]
        v = flat[pos - 1]
        u_idx = pos - 2
        has_u = local >= 2
        u = np.where(has_u, flat[np.maximum(u_idx, 0)], -1)
        out = np.empty(total_pos, dtype=np.float64)
        m_bi = ~has_u
        if m_bi.any():
            out[m_bi] = self.cond2(v[m_bi], w[m_bi])
        if has_u.any():
            out[has_u] = self.cond3(u[has_u], v[has_u], w[has_u])
        # reduce per row
        row_starts = np.concatenate(([0], np.cumsum(seq_lens - 1)[:-1]))
        sums = np.add.reduceat(out, row_starts)
        return 10.0 ** (-sums / (lens + 1))

    # ---------------- detector window scoring ----------------

    def window_avg_scores(self, sentence: str):
        """Per-char averaged 2/3-gram scores — reference detector.py:441-461.

        Returns float64 array of len(sentence), or None when the sentence is
        too short for both n=2 and n=3 windows (len < 2).
        """
        ids = self.encode(sentence)
        L = len(ids)
        per_n = []
        if L >= 2:
            u = self.uni(ids)
            c2 = self.cond2(ids[:-1], ids[1:])          # cond2[i] = P(s[i+1]|s[i])
            w2 = u[:-1] + c2                             # score of s[i:i+2]
            per_n.append(self._pad_and_average(w2, 2, L))
        if L >= 3:
            c3 = self.cond3(ids[:-2], ids[1:-1], ids[2:])  # P(s[i+2]|s[i],s[i+1])
            w3 = u[:-2] + c2[:-1] + c3                      # score of s[i:i+3]
            per_n.append(self._pad_and_average(w3, 3, L))
        if not per_n:
            return None
        return np.average(np.array(per_n), axis=0)

    @staticmethod
    def _pad_and_average(scores: np.ndarray, n: int, sent_len: int) -> np.ndarray:
        """Edge-pad by repeating first/last score (n-1 times each side),
        then mean over sliding windows of size n — detector.py:452-456."""
        padded = np.concatenate((
            np.repeat(scores[0], n - 1),
            scores,
            np.repeat(scores[-1], n - 1),
        ))
        # windows i..i+n-1 for i in range(sent_len); all full by construction
        csum = np.concatenate(([0.0], np.cumsum(padded)))
        return (csum[n:n + sent_len] - csum[:sent_len]) / float(n)


def mad_outlier_indices(scores: np.ndarray, ratio: float = 0.6745, threshold: float = 2.0):
    """Median-absolute-deviation outlier test — reference detector.py:330-355.

    Flags i where ratio*|s_i - median|/MAD > threshold AND s_i < median.
    """
    scores = np.asarray(scores, dtype=np.float64)
    median = np.median(scores)
    margin = np.abs(scores - median)
    mad = np.median(margin)
    if mad == 0:
        return []
    y = ratio * margin / mad
    idx = np.where((y > threshold) & (scores < median))[0]
    return [int(i) for i in idx]


def stddev_outlier_indices(scores: np.ndarray, n_sigma: float = 2.0):
    """Mean +- n*sigma outlier rule — reference detector.py:357-372 (the
    unused alternative to the MAD test; kept for config parity). Matches
    the reference exactly: sample std (ddof=1) and BOTH tails flagged."""
    scores = np.asarray(scores, dtype=np.float64)
    if len(scores) < 2:
        return []
    std = scores.std(ddof=1)
    if std == 0:
        return []
    mean = scores.mean()
    lo, hi = mean - n_sigma * std, mean + n_sigma * std
    return [int(i) for i in np.where((scores < lo) | (scores > hi))[0]]


def _id_to_token(lm: CharNgramLM):
    rev = {}
    for c, i in lm.vocab.items():
        if c == " ":
            rev[i] = "<sp>"  # space is the ARPA token separator
        elif c in ("\t", "\n", "\r"):
            # tab is the ARPA field separator and newline the record
            # separator — a vocab containing them cannot serialize to a
            # well-formed file; fail loudly instead of corrupting it
            raise ValueError(
                f"vocabulary char {c!r} is not representable in ARPA text; "
                "strip control whitespace from the training corpus first"
            )
        else:
            rev[i] = c
    rev[0] = "<unk>"
    rev[1] = "<s>"
    rev[2] = "</s>"
    return rev


def to_arpa_lines(lm: CharNgramLM):
    """Serialize a CharNgramLM to standard ARPA text lines (log10 probs,
    TAB-separated, \\data\\ header) — the interchange format KenLM's
    lmplz/build_binary consume and emit, so a model trained here can be
    inspected or shipped, and load_arpa(to_arpa_lines(lm)) round-trips to
    identical scores."""
    rev = _id_to_token(lm)
    base = lm.base
    uni_ids = [0, 1, 2] + sorted(lm.vocab.values())
    lines = ["\\data\\",
             f"ngram 1={len(uni_ids)}",
             f"ngram 2={len(lm.keys2)}",
             f"ngram 3={len(lm.keys3)}",
             "",
             "\\1-grams:"]
    for i in uni_ids:
        bow = lm.bow1[i]
        if bow != 0.0:
            lines.append(f"{lm.p1[i]:.7f}\t{rev[i]}\t{bow:.7f}")
        else:
            lines.append(f"{lm.p1[i]:.7f}\t{rev[i]}")
    lines.append("")
    lines.append("\\2-grams:")
    for k, p, bow in zip(lm.keys2, lm.p2, lm.bow2):
        a, b = divmod(int(k), base)
        gram = f"{rev[a]} {rev[b]}"
        if bow != 0.0:
            lines.append(f"{p:.7f}\t{gram}\t{bow:.7f}")
        else:
            lines.append(f"{p:.7f}\t{gram}")
    lines.append("")
    lines.append("\\3-grams:")
    for k, p in zip(lm.keys3, lm.p3):
        ab, c = divmod(int(k), base)
        a, b = divmod(ab, base)
        lines.append(f"{p:.7f}\t{rev[a]} {rev[b]} {rev[c]}")
    lines.append("")
    lines.append("\\end\\")
    return lines


def load_arpa(source) -> CharNgramLM:
    """Parse a standard ARPA text model into a CharNgramLM.

    ``source``: a path or an iterable of lines. Orders 1-3 supported
    (higher orders rejected — the detector's query semantics are order-3,
    reference detector.py:268-284). Tokens must be single characters apart
    from <s>/</s>/<unk> and the <sp> escape for the literal space char —
    ARPA cannot carry a bare space token, since space is the n-gram
    separator (this is a CHAR LM, the reference's people_chars_lm.klm
    class of model). Backoff weights default to 0 when a line omits them,
    per the ARPA spec."""
    if isinstance(source, str):
        with open(source, "r", encoding="utf-8") as f:
            lines = f.read().splitlines()
    else:
        lines = list(source)

    sections = {}
    order = 0
    for line in lines:
        line = line.strip()
        if not line:
            continue
        if line.startswith("\\") and line.endswith("-grams:"):
            order = int(line[1:line.index("-")])
            if order > 3:
                raise ValueError(f"ARPA order {order} unsupported (max 3)")
            sections[order] = []
            continue
        if line in ("\\data\\", "\\end\\") or line.startswith("ngram "):
            order = 0
            continue
        if order:
            parts = line.split("\t")
            if len(parts) == 1:  # some tools emit space-separated rows
                parts = line.split()
                parts = [parts[0], " ".join(parts[1:order + 1])] + parts[order + 1:]
            logp = float(parts[0])
            gram = parts[1].split(" ")
            bow = float(parts[2]) if len(parts) > 2 else 0.0
            sections[order].append((logp, gram, bow))

    if 1 not in sections:
        raise ValueError("ARPA file has no \\1-grams: section")

    special = {"<s>": 1, "</s>": 2, "<unk>": 0}
    # un-escape the space token before vocabulary assembly
    for sec in sections.values():
        for _, gram, _ in sec:
            for j, tok in enumerate(gram):
                if tok == "<sp>":
                    gram[j] = " "
    chars = sorted(
        g[0] for _, g, _ in sections[1] if g[0] not in special
    )
    for c in chars:
        if len(c) != 1:
            raise ValueError(
                f"token {c!r} is not a single character — load_arpa expects "
                "a char-level model (train word models upstream instead)"
            )
    vocab = {c: i + 3 for i, c in enumerate(chars)}
    base = len(vocab) + 3

    def tid(tok):
        return special.get(tok, vocab.get(tok, 0))

    p1 = np.full(base, LOG10_EPS, dtype=np.float64)
    bow1 = np.zeros(base, dtype=np.float64)
    for logp, gram, bow in sections[1]:
        i = tid(gram[0])
        p1[i] = logp
        bow1[i] = bow

    keys2, p2v, bow2v = [], [], []
    for logp, gram, bow in sections.get(2, []):
        keys2.append(_pack2(tid(gram[0]), tid(gram[1]), base))
        p2v.append(logp)
        bow2v.append(bow)
    order2 = np.argsort(np.array(keys2, dtype=np.int64), kind="stable")
    k2 = np.array(keys2, dtype=np.int64)[order2]
    p2 = np.array(p2v, dtype=np.float64)[order2]
    bow2 = np.array(bow2v, dtype=np.float64)[order2]

    keys3, p3v = [], []
    for logp, gram, _bow in sections.get(3, []):
        keys3.append(_pack3(tid(gram[0]), tid(gram[1]), tid(gram[2]), base))
        p3v.append(logp)
    order3 = np.argsort(np.array(keys3, dtype=np.int64), kind="stable")
    k3 = np.array(keys3, dtype=np.int64)[order3]
    p3 = np.array(p3v, dtype=np.float64)[order3]

    return CharNgramLM(vocab, p1, bow1, k2, p2, bow2, k3, p3)


def train_char_lm(corpus, min_count: int = 1) -> CharNgramLM:
    """Train an order-3 absolute-discount backoff char LM.

    ``corpus``: iterable of sentences (strings). Deterministic: vocabulary
    ids assigned in sorted char order.

    Only ``min_count=1`` is supported: with a cutoff, sub-threshold chars
    would all map to the unk id, so distinct pruned n-grams collapse to
    one packed key — the count tables below would then need re-aggregation
    before probability estimation (duplicate keys otherwise corrupt the
    unigram/backoff arrays). Rejected explicitly rather than silently
    mis-trained; vocabulary pruning belongs in corpus preparation.
    """
    if min_count != 1:
        raise ValueError(
            "train_char_lm supports min_count=1 only; prune the corpus "
            "vocabulary upstream instead (see docstring)"
        )
    uni = Counter()
    bi = Counter()
    tri = Counter()
    for sent in corpus:
        if not sent:
            continue
        toks = ["<s>"] + list(sent) + ["</s>"]
        for t in toks[1:]:
            uni[t] += 1
        for i in range(len(toks) - 1):
            bi[(toks[i], toks[i + 1])] += 1
        for i in range(len(toks) - 2):
            tri[(toks[i], toks[i + 1], toks[i + 2])] += 1

    chars = sorted(c for c in uni if c not in ("<s>", "</s>") and uni[c] >= min_count)
    vocab = {c: i + 3 for i, c in enumerate(chars)}
    base = len(vocab) + 3

    def tid(tok):
        if tok == "<s>":
            return 1
        if tok == "</s>":
            return 2
        return vocab.get(tok, 0)

    total_uni = sum(uni.values())
    V = len(vocab) + 2  # + eos + unk share the smoothing mass
    p1 = np.full(base, LOG10_EPS, dtype=np.float64)
    # additive smoothing gives <unk> and every token nonzero mass
    delta = 0.5
    denom = total_uni + delta * (V + 1)
    p1[0] = math.log10(delta / denom)  # unk
    for tok, c in uni.items():
        p1[tid(tok)] = math.log10((c + delta) / denom)
    p1[1] = p1[0]  # <s> is never predicted; give it unk mass for safety

    # context counts for backoff weights
    ctx1_count = Counter()
    ctx1_types = Counter()
    for (a, b), c in bi.items():
        ctx1_count[a] += c
        ctx1_types[a] += 1
    bow1 = np.zeros(base, dtype=np.float64)
    keys2, p2v = [], []
    for (a, b), c in sorted(bi.items()):
        pa = max(c - DISCOUNT, 0.0) / ctx1_count[a]
        # interpolate so every stored prob is nonzero
        lam = DISCOUNT * ctx1_types[a] / ctx1_count[a]
        prob = pa + lam * (10.0 ** p1[tid(b)])
        keys2.append(_pack2(tid(a), tid(b), base))
        p2v.append(math.log10(prob))
    for a in ctx1_count:
        lam = DISCOUNT * ctx1_types[a] / ctx1_count[a]
        bow1[tid(a)] = math.log10(lam) if lam > 0 else LOG10_EPS

    ctx2_count = Counter()
    ctx2_types = Counter()
    for (a, b, c_), c in tri.items():
        ctx2_count[(a, b)] += c
        ctx2_types[(a, b)] += 1

    # bigram-conditional lookup for interpolation during training
    p2_map = {k: v for k, v in zip(keys2, p2v)}

    def cond2_train(vb, wb):
        k = _pack2(vb, wb, base)
        if k in p2_map:
            return 10.0 ** p2_map[k]
        return (10.0 ** bow1[vb]) * (10.0 ** p1[wb])

    keys3, p3v = [], []
    bow2_map = {}
    for (a, b, w), c in sorted(tri.items()):
        lam = DISCOUNT * ctx2_types[(a, b)] / ctx2_count[(a, b)]
        pa = max(c - DISCOUNT, 0.0) / ctx2_count[(a, b)]
        prob = pa + lam * cond2_train(tid(b), tid(w))
        keys3.append(_pack3(tid(a), tid(b), tid(w), base))
        p3v.append(math.log10(prob))
    keys2_arr = np.array(keys2, dtype=np.int64)
    order2 = np.argsort(keys2_arr, kind="stable")
    bow2 = np.zeros(len(keys2), dtype=np.float64)
    for (a, b), c in ctx2_count.items():
        lam = DISCOUNT * ctx2_types[(a, b)] / c
        bow2_map[_pack2(tid(a), tid(b), base)] = math.log10(lam) if lam > 0 else LOG10_EPS
    k2_sorted = keys2_arr[order2]
    p2_sorted = np.array(p2v, dtype=np.float64)[order2]
    bow2_sorted = np.array([bow2_map.get(int(k), 0.0) for k in k2_sorted], dtype=np.float64)

    keys3_arr = np.array(keys3, dtype=np.int64)
    order3 = np.argsort(keys3_arr, kind="stable")
    k3_sorted = keys3_arr[order3]
    p3_sorted = np.array(p3v, dtype=np.float64)[order3]

    return CharNgramLM(vocab, p1, bow1, k2_sorted, p2_sorted, bow2_sorted, k3_sorted, p3_sorted)
