"""fastText-architecture language ID (hashed n-gram bag -> linear ->
softmax; north-star stage 1). Deterministic training, confident margins,
agreement with the heuristic langid where both are defined."""

import numpy as np
import pytest

from pycorrector_spark.fixtures import CLEAN_EN, CLEAN_ZH, JUNK_TEXTS
from pycorrector_spark.operators.langid_ft import (
    FastTextLangID,
    N_BUCKETS,
    default_training_set,
    ngram_bucket_ids,
    train_langid,
)


@pytest.fixture(scope="module")
def model():
    return train_langid()


def test_training_deterministic(model):
    again = train_langid()
    assert np.array_equal(model.W, again.W)
    assert np.array_equal(model.b, again.b)


def test_training_set_fit(model):
    rows = default_training_set()
    acc = sum(model.predict(s)[0] == lab for s, lab in rows) / len(rows)
    assert acc == 1.0


def test_held_out_probes(model):
    # sentences NOT in the training set
    assert model.predict("今天的天气真是不错呀")[0] == "zh"
    assert model.predict("machine learning systems are useful tools")[0] == "en"
    lab, p = model.predict("0987 @@ ++ [] 321")
    assert lab == "und"
    for s in ["这是一个中文句子", "this is clearly english text"]:
        _, prob = model.predict(s)
        assert prob > 0.9  # confident margin on easy probes


def test_agreement_with_heuristic(model):
    from pycorrector_spark.textops import lang_id

    rows = [(s, "zh") for s in CLEAN_ZH] + [(s, "en") for s in CLEAN_EN]
    agree = sum(
        model.predict(s)[0] == lang_id(s)[0] == lab for s, lab in rows
    ) / len(rows)
    assert agree == 1.0


def test_scores_sum_to_one(model):
    for s in CLEAN_ZH[:3] + CLEAN_EN[:3] + JUNK_TEXTS[:2]:
        p = model.scores(s)
        assert p.shape == (3,)
        assert p.sum() == pytest.approx(1.0)


def test_ngram_ids_shape_and_range():
    ids = ngram_bucket_ids("abc")
    # "\x02abc\x03" -> 5 unigrams + 4 bigrams + 3 trigrams
    assert len(ids) == 12
    assert ids.min() >= 0 and ids.max() < N_BUCKETS
    assert ngram_bucket_ids("").tolist() == ngram_bucket_ids(None).tolist()


def test_model_roundtrips_through_pickle(model):
    import pickle

    clone = pickle.loads(pickle.dumps(model))
    assert isinstance(clone, FastTextLangID)
    for s in CLEAN_ZH[:2] + CLEAN_EN[:2]:
        assert clone.predict(s) == model.predict(s)
