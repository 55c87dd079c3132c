"""Structured Streaming over the events table (SURVEY §2.8).

The reference has no streaming surface — its closest analog is the
chunked Athena generator (``crawler/src/utils/athena.py:30-54``) and
the LOGICAL_DATE batch-incremental pattern. This module supplies the
streaming counterpart a modern pipeline needs:

- a file-source stream over the events parquet directory;
- tumbling/sliding window aggregations with a watermark for late data
  (same ``F.window`` shape as the batch ``events_hourly_windows``
  query — batch/stream parity by construction);
- a sessionization example via ``applyInPandasWithState``-free
  windowing (session_window), staying declarative.

All queries write to the ``memory`` sink in tests; production sinks
are parquet/Kafka via ``writeStream`` options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.timestamps import normalize_event_ts, parquet_ts_unit

#: the LEGACY int64-nanos layout of the events stream. Kept for tests
#: that fabricate nanos-encoded files to exercise the legacy branch of
#: ``normalize_event_ts``; ``read_events_stream`` does NOT assume it —
#: it infers the real schema from the files present at start.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch nanoseconds
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    New files appearing under ``events_dir`` are discovered per
    micro-batch — the streaming analog of the reference's incremental
    LOGICAL_DATE reads.

    File streams require an explicit schema; rather than hard-code one
    (testdata regenerations have switched ``ts`` between int64-nanos
    and ``timestamp[us]`` encodings), the schema is taken from a batch
    footer read of the files already present, then ``ts`` is
    normalized to TIMESTAMP dtype-awarely — identical semantics to the
    batch ``load`` path, so stream/batch parity holds under every
    encoding. Later-arriving files must match the starting encoding
    (standard file-source contract). Starting on an EMPTY directory
    falls back to ``EVENTS_RAW_SCHEMA`` (the legacy nanos layout) so a
    stream can be wired up before its producer writes the first file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # session-tz pin: window boundaries and NTZ casts must agree with
    # the batch path (and the oracle) whatever session runs the stream
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from pyspark.errors import AnalysisException

    bigint_unit = parquet_ts_unit(events_dir)
    try:
        schema = spark.read.parquet(events_dir).schema
    except AnalysisException:  # no files yet: unable to infer schema
        schema = EVENTS_RAW_SCHEMA
        # the fallback schema IS the legacy nanos layout — pin the
        # unit rather than leaving later-arriving files to magnitude
        # inference (near-epoch nanos instants would land in the
        # wrong magnitude band and scale 1000×)
        bigint_unit = "ns"
    # default 1 keeps tests deterministic (one batch per file); a
    # production directory with thousands of files should raise this
    # so the backlog drains in a handful of micro-batches
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return normalize_event_ts(raw, bigint_unit=bigint_unit)


def hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark.

    Identical aggregation shape to the batch ``events_hourly_windows``
    oracle query — the watermark bounds state so this runs forever on
    an unbounded stream (state per (window, type) only until the
    watermark passes the window end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_averages(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """30-minute slide over 1-hour windows — overlapping windows, the
    other standard windowed-agg shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def user_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sessionization with a dynamic session_window (gap-based) —
    custom stateful semantics expressed declaratively; state is bounded
    by the watermark, no applyInPandasWithState needed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, timeout_sec: int = 60
):
    """Drain all available input into a memory sink (test/debug helper);
    returns the query handle after processing completes."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    return query
