"""Streaming distribution-drift monitor.

Continuous ingest needs a drift alarm: "did this batch's token
distribution move away from the accepted corpus?" — upstream source
changes, crawler bugs, and spam floods all show up here first, before
they poison mixtures and quality models downstream.

Per micro-batch: unigram-count the batch (map-side combined,
vocabulary-sized output), compute the exact total-variation distance
against a PERSISTED reference distribution (``llm.drift.tv_between`` —
rational arithmetic, no transcendentals), and append one metric row.
Metric rows are written with the run-id idempotent writer keyed by
batch_id, so a crash-replayed batch REPLACES its own row instead of
double-reporting — the same exactly-once discipline as the ingest
gate's data path.

The reference is a (token, cnt) table from
:func:`llm.drift.token_counts` — rebuild it when the accepted corpus
advances enough to re-baseline (a deliberate, visible operation; a
silently self-updating baseline can never alarm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..llm import drift as DR
from ..sinks.parquet import write_idempotent_run


def build_token_reference(
    df: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Persist the reference unigram distribution (vocabulary-sized)."""
    DR.token_counts(df, text_col).write.mode("overwrite").parquet(path)


def stream_token_drift(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    reference_path: str,
    metrics_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Monitor arriving document files against the persisted
    reference; one (batch_id, n_tokens_batch, n_tokens_reference,
    tv_distance, top_token) row per micro-batch lands at
    ``metrics_path``. Returns the StreamingQuery handle."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        reference = spark.read.parquet(reference_path)
        row = DR.tv_between(DR.token_counts(batch, text_col), reference)
        metric = row.select(
            F.lit(int(batch_id)).alias("batch_id"),
            F.col("n_tokens_a").alias("n_tokens_batch"),
            F.col("n_tokens_b").alias("n_tokens_reference"),
            "tv_distance",
            "top_token",
        )
        write_idempotent_run(metric, metrics_path, run_id=str(batch_id))

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
