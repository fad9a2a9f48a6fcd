"""Differential tests: the SymSpell deletes index must reproduce the Norvig
edits1/edits2 candidate sets exactly (it is the pipeline's fast path; the
serial oracle keeps the brute-force scan)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pycorrector_spark.refimpl.core import EnSpellCorrector
from pycorrector_spark.symspell import DeletesIndex, deletes_upto2, dl_distance, osa_distance

WORDS = [
    "the", "cat", "hat", "that", "spelling", "spelled", "spell", "correct",
    "corrected", "bicycle", "arranged", "poetry", "data", "quality", "ab",
    "a", "scan", "scans", "span", "plan", "batch", "match", "watch",
]
FREQ = {w: 10 * (i + 1) for i, w in enumerate(WORDS)}


@pytest.fixture(scope="module")
def brute():
    return EnSpellCorrector(FREQ)


@pytest.fixture(scope="module")
def indexed():
    return EnSpellCorrector(FREQ, index=DeletesIndex(sorted(FREQ)))


def test_osa_distance_basic():
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("abc", "abd") == 1      # replace
    assert osa_distance("abc", "acb") == 1      # transpose
    assert osa_distance("abc", "ab") == 1       # delete
    assert osa_distance("abc", "abcd") == 1     # insert
    assert osa_distance("abc", "xyz") == 3      # capped
    assert osa_distance("", "ab") == 2


def test_dl_distance_unrestricted_transposition():
    # the case that separates DL from OSA: transpose then edit across it
    assert dl_distance("et", "the") == 2      # et -> te -> the
    assert osa_distance("et", "the") == 3     # OSA forbids this
    assert dl_distance("abc", "acb") == 1
    assert dl_distance("ca", "abc") == 2      # classic DL-vs-OSA example
    assert dl_distance("abc", "abc") == 0
    assert dl_distance("", "ab") == 2


def test_deletes_upto2_counts():
    d = deletes_upto2("abcd")
    assert "abcd" in d and "abc" in d and "ab" in d
    # n + C(n,2) + 1 distinct for distinct-char words
    assert len(d) == 1 + 4 + 6


def test_edits1_is_osa1(brute):
    # the equivalence the index relies on: dict-word membership in edits1(q)
    # coincides with OSA distance 1
    for q in ["cst", "spleling", "watc"]:
        e1 = brute.edits1(q)
        for w in WORDS:
            assert (w in e1) == (osa_distance(q, w) == 1), (q, w)


@pytest.mark.parametrize("q", ["cat", "cst", "speling", "spel", "xyzzy", "wtach",
                               "qualaty", "poetrry", "b", "ba", "scna", "batcch"])
def test_candidates_match_bruteforce(brute, indexed, q):
    assert indexed.candidates(q) == brute.candidates(q)
    assert indexed.correct_word(q) == brute.correct_word(q)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdehilnpst", min_size=1, max_size=9))
def test_candidates_match_bruteforce_fuzz(brute, indexed, q):
    # module-scoped fixtures are safe with hypothesis (only function-scoped
    # ones interact badly with example reuse) — no rebuild per example
    assert indexed.candidates(q) == brute.candidates(q)


def test_index_probe_speed():
    idx = DeletesIndex(sorted(FREQ))
    import time

    t0 = time.perf_counter()  # monotonic; time.time() can step under NTP
    for _ in range(100):
        idx.candidates("speling")
    per = (time.perf_counter() - t0) / 100
    # generous bound: the point is "index probe is not the ~30ms edits2
    # scan", not a microbenchmark that flakes on a loaded CI host
    assert per < 0.02
