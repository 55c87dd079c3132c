"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Partition pruning skips on ONE column; real workloads filter on two
(user AND time, region AND date). Z-ordering interleaves the bits of
both keys into one sort key, so sorting by it co-locates rows that are
close in BOTH dimensions — parquet min/max footer stats then skip
files/row-groups for either predicate. This is the technique behind
Delta/Iceberg OPTIMIZE ZORDER, built here from pure column
expressions (shift/or folds — no UDF).

Keys are first rank-normalized to ``bits``-bit integers via percent_rank
(robust to skew and arbitrary ranges: equal-width bit buckets over a
skewed raw domain would put everything in a few buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_COLUMN = "_zorder"


def _interleave(a, b, bits: int):
    """Morton-interleave two ``bits``-bit ints: a's bit i → 2i+1,
    b's bit i → 2i."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        a_bit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        b_bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(a_bit, 2 * i + 1))
            .bitwiseOR(F.shiftleft(b_bit, 2 * i))
        )
    return z


def with_zorder(
    df: DataFrame, col_a: str, col_b: str, bits: int = 12
) -> DataFrame:
    """Attach the interleaved sort key for (col_a, col_b)."""
    rank_a = F.percent_rank().over(Window.orderBy(col_a))
    rank_b = F.percent_rank().over(Window.orderBy(col_b))
    max_val = (1 << bits) - 1
    qa = F.round(rank_a * max_val).cast("long")
    qb = F.round(rank_b * max_val).cast("long")
    return df.withColumn(Z_COLUMN, _interleave(qa, qb, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 12,
) -> None:
    """Rewrite ``df`` range-partitioned + sorted on the z-key: each
    output file covers a compact 2-D tile, so min/max stats skip most
    files for a selective predicate on EITHER column.

    Note: percent_rank over a global window is a single-partition sort
    at layout time — for a 100 TB rewrite, substitute approx quantile
    bucketing per key; layout cost is paid once, skipping is forever.
    """
    z = with_zorder(df, col_a, col_b, bits)
    (
        z.repartitionByRange(num_files, Z_COLUMN)
        .sortWithinPartitions(Z_COLUMN)
        .drop(Z_COLUMN)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(path)
    )
