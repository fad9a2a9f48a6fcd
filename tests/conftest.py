"""Shared fixtures: one SparkSession per test run, driver-built artifacts,
serial oracle correctors, and the deterministic docs table.

Mirrors the reference's conftest strategy (/root/reference/conftest.py:55-71
routes every test to the small char LM so the suite is network-free and
fast) — our artifacts are likewise the small deterministic fixture LM.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycorrector_spark.config import DEFAULT_CONFIG
from pycorrector_spark.fixtures import make_docs
from pycorrector_spark.operators.score import build_artifacts
from pycorrector_spark.refimpl.core import Corrector, EnSpellCorrector


@pytest.fixture(scope="session")
def spark():
    from pycorrector_spark.session import get_spark

    s = get_spark("pycorrector_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def artifacts():
    return build_artifacts(DEFAULT_CONFIG)


@pytest.fixture(scope="session")
def full_artifacts():
    # the production-default bundle (reference-scale dims); cached per
    # process so pipeline tests and run_quality_pipeline share one build
    from pycorrector_spark.operators.score import default_artifacts

    return default_artifacts(DEFAULT_CONFIG)


@pytest.fixture(scope="session")
def full_workers(full_artifacts):
    from pycorrector_spark.operators.score import make_workers

    return make_workers(full_artifacts)


@pytest.fixture(scope="session")
def zh(artifacts):
    return Corrector(
        lm=artifacts.lm,
        word_freq=artifacts.word_freq,
        confusion_dict=artifacts.confusion,
        stopwords=artifacts.stopwords,
        similar_chars=artifacts.similar,
        ppl_threshold=artifacts.cfg.ppl_rerank_threshold,
    )


@pytest.fixture(scope="session")
def en(artifacts):
    return EnSpellCorrector(artifacts.en_word_freq, artifacts.en_confusion)


@pytest.fixture(scope="session")
def docs_pdf():
    return make_docs(n_docs=300, seed=42)
