"""Stream-stream joins and streaming deduplication.

Completes the Structured Streaming surface (SURVEY §2.8 beyond-ref):

- ``join_views_to_purchases``: inner join of two unbounded streams on
  key + time-range. Both sides carry watermarks and the join condition
  bounds the time skew, so each side's buffered state is evicted once
  the watermark passes the range — without the time bound a
  stream-stream join buffers FOREVER (unbounded state), which is why
  the range condition is mandatory at 100 TB.
- ``dedup_stream``: exactly-once-per-key emission within the watermark
  horizon via ``dropDuplicatesWithinWatermark`` — the streaming analog
  of the batch pipeline's anti-join dedup: late duplicates inside the
  horizon are suppressed, state is evicted past it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_views_to_purchases(
    views: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases attributed to a same-user view at most ``max_gap``
    earlier. State on both sides is bounded by watermark + range."""
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "purchase_ts",
        "view_ts",
        "value",
    )


def dedup_stream(
    events: DataFrame,
    key: str = "event_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """First occurrence per key wins; duplicates arriving within the
    watermark horizon are dropped, state evicted past it."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )
