"""Bucketed-table layout (pycorrector_spark/storage.py): co-located joins
must not shuffle either side, and results must equal the plain join."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from pycorrector_spark.storage import colocated_join, has_exchange, write_bucketed


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    right = spark.range(0, 200, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("score")
    )
    write_bucketed(left, "t_left", str(tmp_path / "left"), key="doc_id", buckets=4)
    write_bucketed(right, "t_right", str(tmp_path / "right"), key="doc_id", buckets=4)
    yield left, right
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    # broadcast disabled so the test proves the BUCKETED plan (a broadcast
    # join would be shuffle-free for the trivial reason)
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        j = colocated_join(spark, "t_left", "t_right", on="doc_id")
        assert not has_exchange(j)
        assert j.count() == 100

    # reading the same files WITHOUT the catalog (plain parquet) loses the
    # bucketing metadata -> the join shuffles; proves the assert above is
    # non-vacuous and the layout (not the data size) removes the shuffle
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        lp = spark.table("t_left").inputFiles()[0].rsplit("/", 1)[0]
        rp = spark.table("t_right").inputFiles()[0].rsplit("/", 1)[0]
        plain = spark.read.parquet(lp).join(spark.read.parquet(rp), on="doc_id")
        assert has_exchange(plain)


def test_colocated_join_matches_plain_join(spark, bucketed_pair):
    left, right = bucketed_pair
    got = sorted(
        colocated_join(spark, "t_left", "t_right", on="doc_id").collect()
    )
    want = sorted(left.join(right, on="doc_id").collect())
    assert got == want


def test_write_bucketed_overwrite_roundtrip(spark, tmp_path):
    df = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    write_bucketed(df, "t_rt", str(tmp_path / "rt"), key="doc_id", buckets=2)
    write_bucketed(df, "t_rt", str(tmp_path / "rt"), key="doc_id", buckets=2)
    assert spark.table("t_rt").count() == 50
    spark.sql("DROP TABLE IF EXISTS t_rt")
