"""Structured Streaming pipeline: same results as batch, exactly-once
across incremental file arrivals and a checkpoint restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_docs(spark, urls_texts):
    return spark.createDataFrame(
        [(u, t, "en") for u, t in urls_texts], "url string, text string, lang string"
    ).selectExpr(
        "url", "current_timestamp() AS warc_ts",
        "encode(text, 'utf-8') AS html", "text", "lang",
    )


BATCH1 = [
    ("s1", "a quiet morning walk is good for the mind and body"),
    ("s2", "!!!***###"),
]
BATCH2 = [
    ("s3", "the quick brown fox jumps over the lazy dog every single day"),
]


def test_streaming_matches_batch_and_resumes(spark, tmp_path):
    from pycorrector_spark.pipeline import run_quality_pipeline
    from pycorrector_spark.streaming import run_streaming_pipeline

    src = tmp_path / "src"
    out = tmp_path / "out"
    _mk_docs(spark, BATCH1).coalesce(1).write.mode("append").parquet(str(src))

    run_streaming_pipeline(spark, str(src), str(out))
    got1 = spark.read.parquet(str(out / "docs_out"))
    assert got1.count() == 2

    # second tranche of files arrives; restart from the same checkpoint:
    # only the new files are processed (no dup urls)
    _mk_docs(spark, BATCH2).coalesce(1).write.mode("append").parquet(str(src))
    run_streaming_pipeline(spark, str(src), str(out))
    got = spark.read.parquet(str(out / "docs_out"))
    assert got.count() == 3
    assert got.select("url").distinct().count() == 3

    # per-doc results identical to the batch pipeline
    batch = run_quality_pipeline(spark, _mk_docs(spark, BATCH1 + BATCH2))
    cols = ["url", "keep", "drop_reason", "scrubbed_text", "n_errors"]
    b = {r["url"]: r for r in batch.select(*cols).collect()}
    s = {r["url"]: r for r in got.select(*cols).collect()}
    assert b == s

    # audit: one run per micro-batch epoch, covering every doc exactly once
    audit = spark.read.parquet(str(out / "audit"))
    # per-partition rows cover every doc once; the partition_id=-1 rows
    # are the per-run summary markers (excluded from partition totals)
    per_part = audit.filter("partition_id >= 0")
    assert per_part.agg(F.sum("n_rows")).first()[0] == 3
    assert audit.select("run_id").distinct().count() >= 2
