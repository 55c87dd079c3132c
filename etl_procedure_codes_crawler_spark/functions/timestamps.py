"""Event-timestamp normalization (encoding-robust, batch + stream).

The driver-generated ``events.parquet`` has carried its ``ts`` column
under different parquet encodings across regenerations:

- ``TIMESTAMP(NANOS)`` — Spark can't read it natively; with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
  ``bigint`` nanoseconds;
- ``timestamp[us]`` (no timezone) — Spark 4 reads ``TIMESTAMP_NTZ``;
- ``timestamp[us, tz=UTC]`` — Spark reads ``TIMESTAMP`` (LTZ).

Code must never assume which encoding a file it doesn't own uses.
This module is the single place that looks at the *actual* dtype and
normalizes to a session-timezone ``TIMESTAMP`` (sessions here pin
``spark.sql.session.timeZone=UTC``, so all three encodings agree on
wall-clock — the same interpretation DuckDB applies when reading the
naive/NTZ columns for the oracle comparison).

Both the batch loader (``plans.relational.load``) and the streaming
reader (``streaming.events.read_events_stream``) route through
``normalize_event_ts``; operators that need epoch arithmetic on
timestamps they didn't load themselves use ``epoch_micros``, which
tolerates ``TIMESTAMP_NTZ`` inputs.

All of this is a plain column cast — whole-stage-codegen'd, no Python
in the hot path, and it does not block parquet filter pushdown on the
other columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_event_ts", "epoch_micros"]


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-timestamp column to TIMESTAMP, whatever the
    file encoding produced. Works on batch and streaming DataFrames
    (only the analyzed schema is consulted).

    - ``bigint``        → interpreted as epoch *nanoseconds* (the
      legacy ``nanosAsLong`` read path), truncated to micros — the
      same truncation DuckDB applies to TIMESTAMP_NS;
    - ``timestamp_ntz`` → cast to TIMESTAMP via the session timezone
      (UTC in this engine), preserving wall-clock;
    - ``timestamp``     → already correct, untouched;
    - column absent     → untouched (caller's schema has no event ts).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
        )
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_micros(col: str | Column) -> Column:
    """``unix_micros`` that also accepts TIMESTAMP_NTZ.

    ``F.unix_micros`` raises AnalysisException on TIMESTAMP_NTZ input;
    casting through TIMESTAMP first is a no-op for TIMESTAMP columns
    and a session-timezone (UTC) reinterpretation for NTZ — exactly
    the normalization :func:`normalize_event_ts` applies at load.
    Generic operators (as-of join, range join) use this so they stay
    correct on frames the caller built without going through
    ``load``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
