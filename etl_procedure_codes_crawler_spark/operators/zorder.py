"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

Partition pruning skips on ONE column; real workloads filter on two
(user AND time, region AND date). Z-ordering interleaves the bits of
both keys into one sort key, so sorting by it co-locates rows that are
close in BOTH dimensions — parquet min/max footer stats then skip
files/row-groups for either predicate. This is the technique behind
Delta/Iceberg OPTIMIZE ZORDER, built here from pure column
expressions (shift/or folds — no UDF).

Keys are rank-normalized to ``bits``-bit integers via quantile-edge
binning (robust to skew and arbitrary ranges: equal-width bit buckets
over a skewed raw domain would put everything in a few buckets). The
edges come from ONE distributed ``percentile_approx`` aggregation whose
tiny result is inlined as literals, and each row finds its bin with an
O(bits) expression-level binary search — no global window, no
single-partition sort, so the layout pass itself scales to the table
sizes it exists to serve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COLUMN = "_zorder"

# percentile_approx accuracy: error ~ 1/accuracy of the rank; bins only
# need to be accurate to ~half a bucket, but cheap enough to overshoot.
_QUANTILE_ACCURACY = 50_000


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


def _quantile_edges(df: DataFrame, cols: list[str], bits: int) -> dict[str, list[float]]:
    """Interior quantile edges (2^bits - 1 per column) from a single
    distributed aggregation; the collected result is O(2^bits) doubles."""
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    row = df.select(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), F.array(*[F.lit(p) for p in probs]),
                F.lit(_QUANTILE_ACCURACY),
            ).alias(c)
            for c in cols
        ]
    ).first()
    return {c: [v for v in (row[c] or []) if v is not None] for c in cols}


def _count_le(arr: Column, value: Column) -> Column:
    """#{e in arr : e <= value} as a single codegen'd fold.

    Null values compare null everywhere → bin 0. NaN takes the TOP
    bin: Spark's comparison semantics order NaN greater than every
    numeric (``edge <= NaN`` is true for all edges) — the same place a
    sort-based layout would put NaN rows, so the z-curve stays
    consistent with Spark ordering. Pinned in tests/test_zorder.py."""
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, x: acc + F.when(x <= value, F.lit(1)).otherwise(F.lit(0)),
    )


def _bin_by_edges(value: Column, edges: list[float]) -> Column:
    """Bin index = count of edges <= value.

    Sorted edges E (|E| = n_bins - 1) are split into a coarse array
    C[j] = E[B*j + B-1] and per-block fine arrays F[a] = E[B*a .. B*a+B-2]
    with block size B ≈ sqrt(n_bins). Then

        count = B * #{C <= v} + #{F[#{C <= v}] <= v}

    — two O(B) folds instead of one O(n_bins) scan, with every literal
    appearing exactly once in the expression tree. (A chained
    binary-search expression would be O(log n) at runtime but its
    unshared when()-nesting grows the tree exponentially.)
    """
    if not edges:
        return F.lit(0).cast("long")
    n = len(edges)
    block = 1 << (max(1, (n + 1).bit_length() - 1) // 2)
    if block < 2 or (n + 1) % block != 0:
        # edge list not a power-of-two layout (defensive); linear fold
        arr = F.array(*[F.lit(float(e)) for e in edges])
        return _count_le(arr, value).cast("long")
    coarse = F.array(
        *[F.lit(float(edges[block * j + block - 1])) for j in range((n + 1) // block - 1)]
    )
    fine = F.array(
        *[
            F.array(*[F.lit(float(e)) for e in edges[block * a : block * a + block - 1]])
            for a in range((n + 1) // block)
        ]
    )
    a = _count_le(coarse, value)
    fine_cnt = _count_le(F.element_at(fine, (a + 1).cast("int")), value)
    return (a * block + fine_cnt).cast("long")


def with_zorder(
    df: DataFrame, col_a: str, col_b: str, bits: int = 12
) -> DataFrame:
    """Attach the interleaved sort key for (col_a, col_b).

    Triggers one small aggregation job (quantile edges) at plan-build
    time; the per-row path is pure expressions.
    """
    edges = _quantile_edges(df, [col_a, col_b], bits)
    qa = _bin_by_edges(F.col(col_a).cast("double"), edges[col_a])
    qb = _bin_by_edges(F.col(col_b).cast("double"), edges[col_b])
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

    Scale path: the only global coordination is the quantile-edge
    aggregation (tiny result) and the range-partitioner's sampling —
    both distributed. No per-row Python, no single-partition window.
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
