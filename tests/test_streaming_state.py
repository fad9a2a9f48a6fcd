"""Stateful streaming operators: first-seen dedup (applyInPandasWithState)
and watermarked per-host window metrics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, path, rows, ts_base="2026-01-01 10:{m:02d}:00"):
    """rows: list of (url, text, minute). One parquet file per call."""
    data = [
        (u, t, datetime.fromisoformat(f"2026-01-01 10:{m:02d}:00"))
        for u, t, m in rows
    ]
    spark.createDataFrame(
        data, "url string, text string, warc_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, out_rows, checkpoint):
    """Run one availableNow pass, appending collected rows to out_rows."""

    def sink(batch_df, epoch_id):
        out_rows.extend(batch_df.collect())

    q = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    from pycorrector_spark.streaming import stream_dedup_first_seen

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_docs(
        spark,
        src,
        [
            ("u1", "alpha text", 0),
            ("u2", "alpha text", 1),  # in-batch duplicate of u1's content
            ("u3", "beta text", 2),
        ],
    )
    schema = spark.read.parquet(src).schema

    def build():
        return stream_dedup_first_seen(spark.readStream.schema(schema).parquet(src))

    got1: list = []
    _drain(build(), got1, ckpt)
    # batch 1: two distinct contents -> two emissions; the duplicate is
    # collapsed inside its key's single invocation (first_in_batch == 2)
    by_text = {r.text: r for r in got1}
    assert set(by_text) == {"alpha text", "beta text"}
    assert by_text["alpha text"].first_in_batch == 2
    assert by_text["alpha text"].url == "u1"  # first-wins within the batch

    # batch 2: one re-crawl (suppressed by state) + one new content
    _write_docs(spark, src, [("u4", "alpha text", 3), ("u5", "gamma text", 4)])
    got2: list = []
    _drain(build(), got2, ckpt)
    assert [r.text for r in got2] == ["gamma text"]
    assert got2[0].url == "u5"


def test_stream_dedup_null_text(spark, tmp_path):
    from pycorrector_spark.streaming import stream_dedup_first_seen

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_docs(spark, src, [("u1", None, 0), ("u2", None, 1)])
    schema = spark.read.parquet(src).schema
    got: list = []
    _drain(
        stream_dedup_first_seen(spark.readStream.schema(schema).parquet(src)),
        got,
        ckpt,
    )
    # NULL text keys as md5('') — both rows collapse to one emission
    assert len(got) == 1 and got[0].first_in_batch == 2


def test_stream_host_metrics_windows(spark, tmp_path):
    from pycorrector_spark.streaming import stream_host_metrics

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_docs(
        spark,
        src,
        [
            ("https://a.example/x", "aaaa", 0),
            ("https://a.example/y", "bb", 1),
            ("https://b.example/z", "cccccc", 2),
            ("https://a.example/w", "dd", 7),  # second 5-minute window
        ],
    )
    schema = spark.read.parquet(src).schema
    got: list = []
    _drain(
        stream_host_metrics(
            spark.readStream.schema(schema).parquet(src),
            window_duration="5 minutes",
            watermark_delay="10 minutes",
        ),
        got,
        ckpt,
    )
    by_key = {(r.win_start.minute, r.host): r for r in got}
    first_a = by_key[(0, "a.example")]
    assert first_a.n_docs == 2 and first_a.mean_len == pytest.approx(3.0)
    assert by_key[(0, "b.example")].n_docs == 1
    assert by_key[(5, "a.example")].n_docs == 1
    # distinct-url estimate is exact at these cardinalities
    assert first_a.n_urls_approx == 2


def test_stream_dedup_state_survives_restart(spark, tmp_path):
    """The checkpointed state store, not the sink, is what suppresses
    re-crawls: a NEW query object over the same checkpoint still knows
    every key from the first run."""
    from pycorrector_spark.streaming import stream_dedup_first_seen

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_docs(spark, src, [("u1", "seen once", 0)])
    schema = spark.read.parquet(src).schema

    def build():
        return stream_dedup_first_seen(spark.readStream.schema(schema).parquet(src))

    got1: list = []
    _drain(build(), got1, ckpt)
    assert len(got1) == 1

    _write_docs(spark, src, [("u9", "seen once", 5)])
    got2: list = []
    _drain(build(), got2, ckpt)
    assert got2 == []  # suppressed purely from restored state
