"""Structured Streaming variant of the quality-filter pipeline.

The reference is strictly batch (no streaming exists in pycorrector; see
SURVEY.md §2.9), and the north rule asks for a restartable batch job — but
the score stage is a stateless ``mapInPandas``, which makes it directly
stream-composable: the same stage object runs under a streaming plan with
exactly-once file-sink semantics and checkpoint recovery for free.

Continuous ingestion shape at production scale::

    docs (file/Kafka source) -> readStream -> score stage -> writeStream
        .option(checkpointLocation) .trigger(availableNow=True | interval)

- File source: each micro-batch is a set of newly-discovered parquet files;
  ``maxFilesPerTrigger`` bounds batch size (backpressure).
- The audit aggregation is per-micro-batch via ``foreachBatch`` (the batch
  ``audit_frame`` reused verbatim — same lineage/metrics rows, keyed by the
  epoch id instead of a run uuid).
- No watermarks/stateful ops needed: the pipeline is per-document pure, so
  late data is just... data. (Windowed/stateful patterns would enter only
  for cross-document aggregations, which the reference does not have.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, PipelineConfig
from .operators.score import default_artifacts, make_score_stage
from .pipeline import audit_frame


def stream_quality_pipeline(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    bc=None,
    max_files_per_trigger: int = None,
) -> DataFrame:
    """Build the streaming scored DataFrame from a parquet file source.

    The source schema is read from existing files (a stream needs an
    explicit schema; production would pin it from the table catalog).
    """
    if bc is None:
        # same production default as the batch path (full reference-scale
        # dims) — streaming and batch must label identically
        bc = spark.sparkContext.broadcast(default_artifacts(cfg))
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    # same pre-Arrow pruning as the batch path (html + computed-name
    # collisions dropped before every micro-batch's JVM->Python exchange)
    from .pipeline import stage_for_scoring

    staged, fields = stage_for_scoring(docs)
    fn, out_schema = make_score_stage(bc, fields)
    return staged.mapInPandas(fn, out_schema)


def run_streaming_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """Start (and with ``available_now`` drain + stop) the streaming job.

    Sinks: ``{out_dir}/docs_out`` and ``{out_dir}/audit`` parquet, written
    per micro-batch into an ``epoch=<id>/`` subdirectory with OVERWRITE
    semantics. foreachBatch is at-least-once (an epoch that wrote its
    files but crashed before the checkpoint committed is re-run on
    restart), so the sink must be idempotent per epoch — overwriting the
    epoch's own directory makes the replay a no-op instead of an append
    duplication. Readers see one consistent copy via partition discovery
    (``spark.read.parquet(out_dir/docs_out)``). Restart with the same
    checkpoint resumes from the last committed batch — the streaming
    counterpart of the batch job's anti-join resume.
    """
    scored = stream_quality_pipeline(spark, input_dir, cfg)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        batch_df.drop("errors", "corrections").write.mode("overwrite").parquet(
            f"{out_dir}/docs_out/epoch={epoch_id}"
        )
        audit_frame(batch_df, run_id=f"epoch-{epoch_id}").write.mode("overwrite").parquet(
            f"{out_dir}/audit/epoch={epoch_id}"
        )

    writer = (
        scored.writeStream.outputMode("append")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
