"""SymSpell-style deletes index for edit-distance-≤2 dictionary lookup.

Replaces the Norvig candidate scan (reference en_spell_corrector.py:98-104:
``known(edits1)`` / ``known(edits2)``, ~200k generated strings per OOV word,
~30 ms) with a precomputed delete-variant index probed in ~100 µs.

Design for executors:
- Built ONCE on the driver from the dictionary, stored as flat numpy arrays
  (sorted uint64 delete-key hashes + int32 word indices), so the broadcast
  unpickles with a memcpy instead of rebuilding a 900k-entry dict per
  Python worker.
- Lookup: generate the query's delete variants (≤ 29 for a 7-char word),
  probe with searchsorted, then VERIFY every candidate with the true
  unrestricted Damerau-Levenshtein distance — hash collisions and the
  deletes over-approximation are both filtered here, so results are exact.

Equivalence to the Norvig sets (differential-tested, incl. hypothesis fuzz,
in tests/test_symspell.py): ``w' ∈ edits_k(w)`` iff ``dl_distance(w, w') ≤ k``
— each edit op (delete/transpose/replace/insert) is one DL op and DL is
defined as the minimum op count. So candidates-by-distance-class from this
index reproduce known(edits1)/known(edits2) exactly.
"""

from __future__ import annotations

import numpy as np

from .textops import blake2b64 as _h64


def deletes_upto2(word: str):
    """All strings obtainable by deleting ≤2 chars (including the word)."""
    out = {word}
    n = len(word)
    d1 = [word[:i] + word[i + 1:] for i in range(n)]
    out.update(d1)
    for w1 in d1:
        for i in range(len(w1)):
            out.add(w1[:i] + w1[i + 1:])
    return out


def osa_distance(a: str, b: str, cap: int = 3) -> int:
    """Optimal-string-alignment distance (Levenshtein + adjacent transpose),
    banded: returns ``cap`` if the distance exceeds ``cap - 1``.

    Used only by tests to cross-verify the distance-1 tier (OSA == DL at
    distance 1). candidates() verifies with dl_distance — OSA under-counts
    two-step compositions like et -> te -> the."""
    la, lb = len(a), len(b)
    if abs(la - lb) >= cap:
        return cap
    if a == b:
        return 0
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = cap
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                prev2 is not None
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            if v < lo:
                lo = v
        if lo >= cap:
            return cap
        prev2, prev = prev, cur
    return min(prev[lb], cap)


def dl_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner): minimum number
    of insert/delete/substitute/adjacent-transpose ops applied sequentially.

    This — not OSA — is the metric matching Norvig's edit composition:
    ``w' ∈ edits_k(w)`` iff ``dl_distance(w, w') <= k``. (Counterexample
    for OSA: 'et' -> transpose -> 'te' -> insert -> 'the' is 2 ops, but
    OSA('et','the') = 3 because OSA forbids editing across a transposed
    pair.)
    """
    la, lb = len(a), len(b)
    if a == b:
        return 0
    maxd = la + lb
    # d has a sentinel row/col at index 0; real cells start at 1
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    da = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,            # substitute / match
                d[i + 1][j] + 1,           # insert
                d[i][j + 1] + 1,           # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


class DeletesIndex:
    """Flat-array deletes index over a word list."""

    def __init__(self, words):
        self.words = list(words)
        keys = []
        idxs = []
        for wi, w in enumerate(self.words):
            for d in deletes_upto2(w):
                keys.append(_h64(d))
                idxs.append(wi)
        keys = np.array(keys, dtype=np.uint64)
        idxs = np.array(idxs, dtype=np.int32)
        order = np.argsort(keys, kind="stable")
        self.keys = keys[order]
        self.idxs = idxs[order]

    def candidates(self, word: str):
        """{dict_word: dl_distance} for every dict word within
        unrestricted Damerau-Levenshtein ≤ 2 (NOT OSA — see dl_distance:
        Norvig's edits2 composes two independent edit passes, which
        equals unrestricted DL, not OSA)."""
        qkeys = np.array([_h64(d) for d in deletes_upto2(word)], dtype=np.uint64)
        lo = np.searchsorted(self.keys, qkeys, side="left")
        hi = np.searchsorted(self.keys, qkeys, side="right")
        cand = set()
        for a, b in zip(lo, hi):
            if b > a:
                cand.update(self.idxs[a:b].tolist())
        out = {}
        for wi in cand:
            w = self.words[wi]
            d = dl_distance(word, w)
            if d <= 2:
                out[w] = d
        return out
