"""Relational Naive Bayes: fit counts, OOV/prior handling, and ordered
fold scoring — differential-tested against a serial numpy/dict replica."""

import math

import pytest

from pycorrector_spark.operators.nbayes import char_ngrams_expr, fit_nb, score_nb
from pyspark.sql import functions as F

DOCS = [
    (0, "en", "the cat sat on the mat"),
    (1, "en", "a dog ate the bone"),
    (2, "en", "the quick brown fox"),
    (3, "zh", "今天天气不错我们出去玩"),
    (4, "zh", "大家一起学习新的知识"),
    (5, "zh", "今天我们一起去公园"),
    (6, "en", "cats and dogs play"),
    (7, "zh", "学习使我快乐"),
    (8, "en", ""),          # empty -> prior-only score
    (9, "zh", "天气"),       # shorter than n -> prior-only score
]


def _serial_nb(docs, n=3, min_count=1):
    """Reference NB: same smoothing, same fold order, plain Python."""
    grams = lambda t: [t.lower()[i:i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []
    counts, label_docs = {}, {}
    for _, lab, text in docs:
        label_docs[lab] = label_docs.get(lab, 0) + 1
        for g in grams(text):
            counts[(lab, g)] = counts.get((lab, g), 0) + 1
    gram_tot = {}
    for (lab, g), c in counts.items():
        gram_tot[g] = gram_tot.get(g, 0) + c
    kept = {k: c for k, c in counts.items() if gram_tot[k[1]] >= min_count}
    vocab = {g for (_, g) in kept}
    labels = sorted(label_docs)
    tok_tot = {l: sum(c for (ll, _), c in kept.items() if ll == l) for l in labels}
    v = len(vocab)
    n_total = sum(label_docs.values())
    priors = {l: math.log(label_docs[l] / n_total) for l in labels}
    oov = {l: math.log(1.0 / (tok_tot[l] + v)) for l in labels}

    out = {}
    for did, _, text in docs:
        scores = []
        for l in labels:
            s = priors[l]
            for g in grams(text):
                if g in vocab:
                    s += math.log((kept.get((l, g), 0) + 1.0) / (tok_tot[l] + v))
                else:
                    s += oov[l]
            scores.append(s)
        best = max(range(len(labels)), key=lambda i: (scores[i], -i))
        out[did] = (labels[best], scores[best])
    return out


@pytest.fixture(scope="module")
def nb_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, lang string, text string")


def test_char_ngrams_short_text_empty(spark):
    df = spark.createDataFrame([("ab",), ("abc",), (None,)], "t string")
    got = [r[0] for r in df.select(char_ngrams_expr(F.col("t"))).collect()]
    assert got == [[], ["abc"], []]


def test_fit_matches_serial_metadata(spark, nb_df):
    model = fit_nb(nb_df)
    assert model.labels == ["en", "zh"]
    want = _serial_nb(DOCS)
    # spot-check priors: 6 en / 4 zh? -> counts from DOCS
    n_en = sum(1 for d in DOCS if d[1] == "en")
    assert model.prior_logps[0] == pytest.approx(math.log(n_en / len(DOCS)), abs=0)


def test_score_matches_serial_bitwise(spark, nb_df):
    model = fit_nb(nb_df)
    got = {r["doc_id"]: (r["nb_pred"], r["nb_logp"])
           for r in score_nb(nb_df, model).collect()}
    want = _serial_nb(DOCS)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        # same fold order, same doubles -> exact equality, not approx
        assert got[did][1] == want[did][1], did


def test_score_partitioning_invariant(spark, nb_df):
    """Fold order is pinned by position sort, so the exact float result
    survives any repartitioning."""
    model = fit_nb(nb_df)
    a = {r["doc_id"]: r["nb_logp"] for r in score_nb(nb_df, model).collect()}
    b = {r["doc_id"]: r["nb_logp"]
         for r in score_nb(nb_df.repartition(7), model).collect()}
    assert a == b


def test_min_count_prunes_to_oov(spark, nb_df):
    """With an absurd min_count every gram is OOV: scores collapse to
    prior + n_grams * oov and predictions follow the prior."""
    model = fit_nb(nb_df, min_count=10_000)
    assert model.gram_logps.count() == 0
    rows = score_nb(nb_df, model).collect()
    n_en = sum(1 for d in DOCS if d[1] == "en")
    for r in rows:
        assert r["nb_pred"] == ("en" if n_en >= len(DOCS) - n_en else "zh")
