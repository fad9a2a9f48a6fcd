"""Checkpoint-resume: kill after part of the input is written, restart,
verify no duplicated and no missing urls (SURVEY.md §5 item 5).
"""

import pytest

from pycorrector_spark.pipeline import run_quality_pipeline, run_with_resume, write_outputs


def test_resume_no_dups_no_gaps(spark, docs_pdf, tmp_path):
    out_dir = str(tmp_path / "out")
    docs = spark.createDataFrame(docs_pdf)

    # simulate a run that died after processing an arbitrary half
    first_half = docs.limit(140)
    scored = run_quality_pipeline(spark, first_half)
    write_outputs(scored, out_dir, run_id="run1")

    n_done = spark.read.parquet(f"{out_dir}/docs_out").count()
    assert n_done == 140

    # restart over the FULL input: only the remainder is processed
    run_with_resume(spark, docs, out_dir)

    result = spark.read.parquet(f"{out_dir}/docs_out")
    assert result.count() == len(docs_pdf)           # no gaps
    assert result.select("url").distinct().count() == len(docs_pdf)  # no dups

    # audit table has rows from both runs
    audit = spark.read.parquet(f"{out_dir}/audit")
    assert audit.select("run_id").distinct().count() == 2


def test_resume_on_fresh_dir(spark, docs_pdf, tmp_path):
    out_dir = str(tmp_path / "fresh")
    docs = spark.createDataFrame(docs_pdf).limit(50)
    run_with_resume(spark, docs, out_dir)
    assert spark.read.parquet(f"{out_dir}/docs_out").count() == 50


def test_resume_idempotent_when_complete(spark, docs_pdf, tmp_path):
    out_dir = str(tmp_path / "idem")
    docs = spark.createDataFrame(docs_pdf).limit(60)
    run_with_resume(spark, docs, out_dir)
    run_with_resume(spark, docs, out_dir)   # second run: nothing to do
    assert spark.read.parquet(f"{out_dir}/docs_out").count() == 60


def test_resume_null_key_rows_not_reprocessed(spark, tmp_path):
    """Regression: a plain equi-anti-join never matches NULL = NULL, so
    rows with a NULL key column were re-scored and re-appended on every
    resume. The null-safe join must keep them exactly-once."""
    import pandas as pd

    from pycorrector_spark.pipeline import run_with_resume

    out = str(tmp_path / "out")
    pdf = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://a.example/2"],
            "warc_ts": [pd.Timestamp("2026-01-01"), pd.NaT],  # one NULL key
            "html": [b"x", b"y"],
            "text": ["some perfectly normal document text here",
                     "another perfectly normal document body text"],
            "lang": ["en", "en"],
        }
    )
    docs = spark.createDataFrame(pdf)
    run_with_resume(spark, docs, out)
    run_with_resume(spark, docs, out)  # resume with nothing left to do
    rows = spark.read.parquet(f"{out}/docs_out").collect()
    assert len(rows) == 2  # NULL-warc_ts row written exactly once
