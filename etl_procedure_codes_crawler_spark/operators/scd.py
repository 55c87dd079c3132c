"""SCD Type-2 history tracking over a parquet warehouse.

Where :func:`operators.merge.merge_upsert` overwrites, SCD2 keeps
every version: a changed key closes the current row (``valid_to`` set
to the change timestamp) and opens a new one (``valid_to`` NULL).
Time-travel ("what did this code's record say last March?") is then a
plain range predicate — the capability an append-only crawler corpus
needs the moment upstream data gets corrections.

One full-outer join of current rows vs updates per apply (history
rows pass through untouched); attribute comparison is a sha2 hash of
the tracked columns, so wide rows compare in one column. No-op
updates (same attributes) produce no new version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import read_table_or_empty
from .merge import replace_dataset_atomically

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def _attr_hash(columns: list[str]):
    return F.sha2(
        F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in columns]),
        256,
    )


def scd2_apply(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    effective_ts: str = "effective_ts",
) -> int:
    """Apply one batch of updates (unique per key, with an
    ``effective_ts`` timestamp column) to the SCD2 dataset at
    ``target_path``. Returns the dataset's new row count."""
    from .merge import recover_interrupted_swap

    recover_interrupted_swap(spark, target_path)
    dup = updates.groupBy(key).count().filter(F.col("count") > 1)
    if not dup.isEmpty():
        sample = [r[key] for r in dup.limit(5).collect()]
        raise ValueError(f"updates contain duplicate keys, e.g. {sample}")
    if not updates.filter(F.col(key).isNull()).isEmpty():
        # the full-outer key join can never match a NULL key; such an
        # update would be silently dropped — reject it loudly instead
        raise ValueError("updates contain a NULL SCD key")

    attrs = [c for c in updates.columns if c not in (key, effective_ts)]
    upd = updates.select(
        F.col(key).alias("_ukey"),
        F.col(effective_ts).alias("_uts"),
        *[F.col(c).alias(f"_u_{c}") for c in attrs],
    ).withColumn("_uhash", _attr_hash([f"_u_{c}" for c in attrs]))

    from pyspark.sql.types import StructField, StructType, TimestampType

    target_schema = StructType(
        [f for f in updates.schema.fields if f.name != effective_ts]
        + [
            StructField(VALID_FROM, TimestampType()),
            StructField(VALID_TO, TimestampType()),
        ]
    )
    target = read_table_or_empty(spark, target_path, target_schema)
    history = target.filter(F.col(VALID_TO).isNotNull())
    current = target.filter(F.col(VALID_TO).isNull()).withColumn(
        "_chash", _attr_hash(attrs)
    )

    joined = current.join(upd, current[key] == upd._ukey, "full_outer")

    # current rows: untouched keys and no-op updates pass through;
    # changed keys get their valid_to stamped
    kept_current = (
        joined.filter(F.col(key).isNotNull())
        .select(
            *[F.col(c) for c in target.columns if c != VALID_TO],
            F.when(
                F.col("_ukey").isNotNull() & (F.col("_uhash") != F.col("_chash")),
                F.col("_uts"),
            ).alias(VALID_TO),
        )
    )
    # new versions: changed keys + brand-new keys
    new_rows = (
        joined.filter(
            F.col("_ukey").isNotNull()
            & (F.col(key).isNull() | (F.col("_uhash") != F.col("_chash")))
        )
        .select(
            F.col("_ukey").alias(key),
            *[F.col(f"_u_{c}").alias(c) for c in attrs],
            F.col("_uts").alias(VALID_FROM),
            F.lit(None).cast("timestamp").alias(VALID_TO),
        )
    )

    merged = history.unionByName(kept_current).unionByName(new_rows)
    pinned = merged.localCheckpoint(eager=True)
    n = pinned.count()
    replace_dataset_atomically(spark, target_path, pinned, op="scd2")
    return n


def as_of(spark: SparkSession, target_path: str, ts) -> DataFrame:
    """Time-travel read: rows valid at ``ts``."""
    df = spark.read.parquet(target_path)
    t = F.lit(ts).cast("timestamp")
    return df.filter(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    ).drop(VALID_FROM, VALID_TO)
