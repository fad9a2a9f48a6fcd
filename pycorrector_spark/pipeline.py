"""End-to-end quality-filter pipeline assembly.

    docs (url, warc_ts, html, text, lang)
      -> url-hash repartition (+ optional hot-host salting)
      -> lang-ID + quality heuristics   (JVM codegen, operators/quality.py)
      -> LM ppl / detect / correct / scrub (Arrow mapInPandas, operators/score.py)
      -> keep/drop + drop_reason
      -> sinks: docs_out parquet, audit parquet, manifest (resume)

Scale notes (100 TB / 1000 executors):
- The pipeline is stateless per document: the only shuffle is the initial
  repartition, which exists to (a) spread skewed input splits and (b)
  co-partition output by url-hash for the resume anti-join. With healthy
  input splits it can be disabled (pass repartition=0).
- Broadcast payload is the LM + dicts (tens of MB) — once per executor.
- AQE handles shuffle-side skew; UDF-stage skew from hot hosts is handled
  by hashing the full url (hosts spread across urls), with an optional
  salt term for pathological single-url duplication.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .operators.score import build_artifacts, make_score_stage


def repartition_by_url(df: DataFrame, n: int, salt_buckets: int = 0) -> DataFrame:
    """Deterministic url-hash repartition with optional salting.

    ``salt_buckets > 0`` spreads each url over that many buckets — used when
    a single key would otherwise dominate a partition (power-law hosts).
    """
    if n <= 0:
        return df
    key = F.xxhash64("url")
    if salt_buckets > 0:
        key = F.xxhash64("url", (F.rand(seed=42) * salt_buckets).cast("int"))
    return df.repartition(n, key)


def run_quality_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    repartition: int = None,
    bc=None,
) -> DataFrame:
    """Return the scored DataFrame (lazy; caller writes sinks)."""
    if repartition is None:
        repartition = cfg.shuffle_partitions
    if repartition and docs.rdd.getNumPartitions() < repartition:
        docs = repartition_by_url(docs, repartition)

    if bc is None:
        bc = spark.sparkContext.broadcast(build_artifacts(cfg))

    # html is dead weight through the Python stage — drop it before the
    # Arrow exchange (column pruning the optimizer can't do for us because
    # mapInPandas is schema-opaque). Everything (cheap signals, gate, LM,
    # detect/correct, scrub, decision) runs in ONE Arrow pass: a single
    # stage, no shuffle, no extra JVM<->Python exchanges.
    # also exclude input columns colliding with computed output names
    # (e.g. an upstream n_chars/lang_id) BEFORE the Arrow exchange so dead
    # columns are never shipped; make_score_stage applies the same
    # exclusion to the schema for callers that don't pre-drop
    from .operators.score import COMPUTED_COLS

    computed = set(COMPUTED_COLS)
    cols = [c for c in docs.columns if c != "html" and c not in computed]
    staged = docs.select(*cols)
    fields = [(f.name, f.dataType.simpleString()) for f in staged.schema.fields]
    fn, out_schema = make_score_stage(bc, fields)
    return staged.mapInPandas(fn, out_schema)


def audit_frame(scored: DataFrame, run_id: str = None) -> DataFrame:
    """Per-partition lineage + metrics rows (north rule).

    One row per (run_id, partition_id): row counts, keep/drop counts,
    min/max ppl, bytes processed.
    """
    run_id = run_id or uuid.uuid4().hex
    return (
        scored.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
            F.sum(F.length("text")).alias("chars_in"),
            F.sum(F.length("scrubbed_text")).alias("chars_out"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("finished_at", F.lit(time.time()))
    )


def write_outputs(scored: DataFrame, out_dir: str, run_id: str = None) -> None:
    """Write docs_out + audit parquet sinks.

    ``localCheckpoint(eager)`` (not cache) is load-bearing: on resume,
    ``scored``'s lineage reads docs_out (the anti-join), and appending to
    docs_out invalidates any cache built on that path — a plain cache would
    silently recompute the audit against the already-extended output and
    produce an EMPTY audit. Checkpointing cuts the lineage first.
    On a cluster this pins one materialized copy in executor storage for
    the duration of the two writes, then releases it.
    """
    scored = scored.localCheckpoint(eager=True)
    scored.drop("errors", "corrections").write.mode("append").parquet(f"{out_dir}/docs_out")
    audit_frame(scored, run_id).write.mode("append").parquet(f"{out_dir}/audit")


def run_with_resume(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> None:
    """Checkpoint-resume: left-anti join against already-written keys.

    Restartable mid-run: whatever made it into docs_out stays; the next run
    processes only the remainder (no dups, no gaps — verified by
    tests/test_resume.py). The key is (url, warc_ts) when both inputs carry
    warc_ts, else url alone (the input contract treats url as the document
    primary key, but keying on the snapshot timestamp too means multiple
    snapshots of one url can never shadow each other across a resume).

    Only a MISSING output path falls back to the full input; any other
    read failure (corrupt footer, permissions, schema drift) must raise —
    silently reprocessing everything would append the whole corpus as
    duplicates.
    """
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(f"{out_dir}/docs_out")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        existing = None
    if existing is not None:
        keys = ["url"]
        if "warc_ts" in docs.columns and "warc_ts" in existing.columns:
            keys = ["url", "warc_ts"]
        done = existing.select(*keys).distinct()
        todo = docs.join(F.broadcast(done) if done.count() < 1_000_000 else done,
                         keys, "left_anti")
    else:
        todo = docs
    scored = run_quality_pipeline(spark, todo, cfg)
    write_outputs(scored, out_dir)
