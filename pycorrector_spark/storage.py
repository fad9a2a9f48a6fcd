"""Bucketed table layout: co-located joins without a shuffle.

At 10^12 documents the dominant cost of every url/doc-keyed join (crawl
vs seen-set, docs vs per-doc stats, incremental snapshots) is the shuffle
of the big side. Spark's answer is bucketing — the table is written
pre-hash-partitioned AND pre-sorted by the join key, so a join of two
tables bucketed the same way is a zero-Exchange sort-merge join: each
task reads bucket i of both sides and merges. This module wraps that
layout so pipelines can persist their hot tables bucketed once and join
them shuffle-free forever after (the parquet+metastore stand-in for an
Iceberg ``bucket(N, key)`` partition transform — same idea, same plan).

Notes:
- Bucket counts must match (or divide evenly, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  shuffle-free plan; pick the count once per key domain and reuse it.
- ``sortBy`` makes the merge phase sort-free too; without it each task
  still sorts its bucket in memory.
- AQE may still choose a broadcast join when one side is tiny — that is
  also shuffle-free, so the invariant worth asserting is "no Exchange",
  not "SortMergeJoin".

Reference parity: the reference is a per-call library with no storage
layer (pycorrector/corrector.py); this is pipeline infrastructure the
100 TB deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "doc_id",
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``table`` is registered in the session catalog (bucketing metadata
    lives in the catalog, not in parquet, so plain ``spark.read.parquet``
    on ``path`` would NOT see the layout — always read via
    ``spark.table``).
    """
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    the plan contains no Exchange on either side."""
    return spark.table(left).join(spark.table(right), on=on, how=how)


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan shuffles (used by tests/plan audits).
    ``BroadcastExchange`` is not a shuffle and is ignored."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in plan.splitlines()
    )
