"""Streaming CDC apply: a change stream continuously upserted into a
parquet warehouse.

Composes the streaming file source with :func:`operators.merge.
merge_upsert` via ``foreachBatch``: each micro-batch is reduced to its
latest change per key (by a monotonic ``order_col`` — CDC events for
one key can arrive many-per-batch and MUST apply in order), then
merged. Deletes ride the stream as a boolean tombstone column.

Replay safety comes from merge semantics: re-applying a batch after a
crash produces the same warehouse state (upserts are latest-wins and
tombstones idempotent), so checkpoint + deterministic reduction give
end-to-end exactly-once effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.merge import merge_upsert


def latest_change_per_key(
    changes: DataFrame, key: str, order_col: str
) -> DataFrame:
    """Reduce a change set to the final state per key: max(order_col)
    wins. The window ordering is made TOTAL by tie-breaking on every
    remaining column (descending, nulls last) — row_number over
    order_col alone is nondeterministic when two changes for a key
    share order_col, and a replayed batch could pick a different
    winner, breaking the module's exactly-once replay claim. With the
    full-row tie-break, replays always pick the same row (rows that
    are byte-identical tie harmlessly)."""
    tiebreaks = [
        F.desc_nulls_last(c)
        for c in changes.columns
        if c not in (key, order_col)
    ]
    w = Window.partitionBy(key).orderBy(F.desc_nulls_last(order_col), *tiebreaks)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_cdc_upsert(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    target_path: str,
    key: str,
    order_col: str,
    checkpoint_dir: str,
    delete_col: str | None = None,
):
    """Continuously apply a CDC file stream to ``target_path``.
    Returns the StreamingQuery handle (availableNow trigger)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        reduced = latest_change_per_key(batch, key, order_col).drop(order_col)
        merge_upsert(
            spark, target_path, reduced, key=key, delete_col=delete_col
        )

    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
