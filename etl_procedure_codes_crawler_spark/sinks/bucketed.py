"""Bucketed-table sink: pre-shuffled storage for co-located joins.

The heaviest recurring cost in the relational corpus is the
orders⋈lineitem shuffle on orderkey. Bucketing pays that shuffle ONCE
at write time: both tables hash-clustered into the same number of
buckets on the join key, so every future equi-join/aggregation on that
key runs shuffle-free (Catalyst recognizes matching bucket specs and
plans a zero-Exchange sort-merge join).

At 100 TB this is the difference between re-shuffling ~10 TB per
query and reading co-located files. The sink is ``saveAsTable``-based
(bucket metadata lives in the catalog; plain ``save`` paths cannot
carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` hash-bucketed (and optionally sorted) by the join
    key. Tables joined on their common bucket key with equal
    ``num_buckets`` join without an Exchange."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("compression", "snappy")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables exist with bucket specs (sanity probe for
    pipelines that fall back to plain joins when bucketing is absent)."""
    try:
        desc_a = spark.sql(f"DESCRIBE TABLE EXTENDED {table_a}").collect()
        desc_b = spark.sql(f"DESCRIBE TABLE EXTENDED {table_b}").collect()
    except Exception:
        return False

    def buckets(desc):
        return any(row.col_name.strip() == "Num Buckets" for row in desc)

    return buckets(desc_a) and buckets(desc_b)
