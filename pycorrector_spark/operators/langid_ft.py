"""fastText-style language identifier.

The north star names "fastText language-ID" as the pipeline's first
stage. The published fastText architecture (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification") is: hashed bag of character
n-gram features -> averaged embedding -> linear layer -> softmax. This
module re-expresses exactly that shape with a deterministic in-repo
training loop instead of a downloaded lid.176.bin (no network, no
external model files in this sandbox):

- features: hashed char 1-3-grams (``textops.blake2b64 % N_BUCKETS`` —
  the repo's one shared hashing primitive) over the lowercased text with
  boundary padding;
- model: a single (buckets x classes) weight matrix — for averaged
  one-hot features, embedding-then-linear collapses to one linear map,
  so this IS the fastText function class at embedding dim = n_classes;
- training: full-batch softmax regression from zero init (no RNG
  anywhere -> bit-deterministic weights) on the labeled fixture corpus;
- scoring: per-text numpy gather + mean + softmax inside Arrow batches.

The heuristic ratio-based langid (textops.lang_id) remains the pipeline
default — it is SQL-expressible, which keeps the keep/drop rule fully
oracle-checkable — and this classifier is the drop-in upgrade surface: a
real fastText .bin's quantized weights would load into the same
(W, b, labels) arrays and the same scoring stage.
"""

from __future__ import annotations

import numpy as np

from ..textops import blake2b64

N_BUCKETS = 1 << 12
LABELS = ("en", "und", "zh")  # sorted; ties break toward the first label


def ngram_bucket_ids(text: str, nmin: int = 1, nmax: int = 3) -> np.ndarray:
    """Hashed char n-gram feature ids for one text (deduplicated like
    fastText's feature set is NOT — fastText counts occurrences; we keep
    the multiset so frequent n-grams weigh more)."""
    t = "\x02" + (text or "").lower() + "\x03"  # boundary markers
    ids = [
        blake2b64(t[i: i + n]) % N_BUCKETS
        for n in range(nmin, nmax + 1)
        for i in range(len(t) - n + 1)
    ]
    return np.asarray(ids, dtype=np.int64)


class FastTextLangID:
    """(W, b) linear model over averaged hashed n-gram features."""

    def __init__(self, W: np.ndarray, b: np.ndarray, labels=LABELS,
                 nmin: int = 1, nmax: int = 3):
        self.W = np.asarray(W, dtype=np.float64)      # (N_BUCKETS, C)
        self.b = np.asarray(b, dtype=np.float64)      # (C,)
        self.labels = tuple(labels)
        self.nmin = nmin
        self.nmax = nmax

    def scores(self, text: str) -> np.ndarray:
        """Softmax class probabilities for one text (float64,
        deterministic accumulation order)."""
        ids = ngram_bucket_ids(text, self.nmin, self.nmax)
        z = self.W[ids].mean(axis=0) + self.b
        z = z - z.max()
        e = np.exp(z)
        return e / e.sum()

    def predict(self, text: str):
        """(label, probability) — argmax with first-label tie-break."""
        p = self.scores(text)
        i = int(np.argmax(p))
        return self.labels[i], float(p[i])

    def predict_batch(self, texts):
        """([labels], [probs]) over an Arrow batch — one gather/mean per
        text (the hashing loop is the python cost; texts are the batch's
        rows, n-grams vectorize inside each)."""
        labels, probs = [], []
        for t in texts:
            lab, p = self.predict(t)
            labels.append(lab)
            probs.append(p)
        return labels, probs


def default_training_set():
    """Labeled fixture corpus: clean + corrupted zh/en plus junk/digit/
    symbol rows as 'und'. Deterministic order."""
    from ..fixtures import CLEAN_EN, CLEAN_ZH, EN_POOL, JUNK_TEXTS, ZH_POOL

    rows = []
    for s in ZH_POOL:
        if s.strip() and any("一" <= c <= "龥" for c in s):
            rows.append((s, "zh"))
    for s in CLEAN_ZH:
        rows.append((s, "zh"))
    for s in EN_POOL + CLEAN_EN:
        rows.append((s, "en"))
    for s in JUNK_TEXTS:
        rows.append((s, "und"))
    rows += [
        ("1234567890 4567 89", "und"),
        ("!!! ??? ... ###", "und"),
        ("---- ==== ++++", "und"),
        ("%%% $$$ @@@ ~~~", "und"),
    ]
    return rows


def train_langid(samples=None, epochs: int = 300, lr: float = 100.0) -> FastTextLangID:
    """Full-batch softmax regression from zero init — bit-deterministic
    (no RNG, fixed iteration order). Driver-side, one-time (~1 s); the
    model ships as one broadcast of two numpy arrays. The lr looks large
    because features are MEANS of one-hot buckets: each weight's gradient
    carries a 1/len(ids) factor, so the effective step is ~lr/len (~1.5
    for typical sentences). 100% accuracy on the training fixtures,
    confident margins on held-out probes (test-enforced)."""
    samples = samples if samples is not None else default_training_set()
    labels = LABELS
    lab_idx = {l: i for i, l in enumerate(labels)}
    ids_per = [ngram_bucket_ids(s) for s, _ in samples]
    y = np.array([lab_idx[l] for _, l in samples], dtype=np.int64)
    n, C = len(samples), len(labels)
    W = np.zeros((N_BUCKETS, C), dtype=np.float64)
    b = np.zeros(C, dtype=np.float64)
    onehot = np.zeros((n, C), dtype=np.float64)
    onehot[np.arange(n), y] = 1.0
    for _ in range(epochs):
        Z = np.stack([W[ids].mean(axis=0) for ids in ids_per]) + b
        Z -= Z.max(axis=1, keepdims=True)
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        G = (P - onehot) / n                      # (n, C)
        for i, ids in enumerate(ids_per):         # scatter the chain rule
            np.add.at(W, ids, -lr * G[i] / len(ids))
        b -= lr * G.sum(axis=0)
    return FastTextLangID(W, b, labels)
