"""Skew-safe grouped top-k: two-phase salted sorted-slice aggregation.

The textbook per-key top-k (``row_number() OVER (PARTITION BY key
ORDER BY ...) <= k``) shuffles EVERY input row to its key's partition
and sorts there — at 100 TB a hot key (one customer with 10⁹ orders)
lands in one task. This operator computes top-k as an *aggregation*
instead:

- phase 1 groups by (key, salt) and keeps each group's sorted top-k
  slice — a hot key's rows spread over ``salt_buckets`` groups, and
  only ``k`` rows per (key, salt) survive;
- phase 2 merges the ≤ ``salt_buckets × k`` salt-local winners per key
  and re-slices.

After phase 1 at most ``keys × salt_buckets × k`` rows move — versus
the window form moving the entire input. The salt is a deterministic
hash of the tie-break column (retry-safe, same discipline as
``operators/skew.py``).

Semantics match ``ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
order_col DESC, tiebreak_col ASC) <= k`` exactly; the tie-break column
must be numeric and unique per row within a key (the usual primary
key), which makes the result deterministic. Gate query
`grouped_topk_orders_per_customer` pins agreement with the window
form's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
    salt_buckets: int = 8,
) -> DataFrame:
    """Top-``k`` rows per key by (``order_col`` DESC, ``tiebreak_col``
    ASC), as two bounded aggregations instead of a full-data window.

    Returns ``keys + [tiebreak_col, order_col, rn]`` with ``rn`` the
    1-based rank. The sort struct stores the NEGATED tie-break so one
    descending array sort yields (order DESC, tiebreak ASC) —
    requires a numeric tie-break, which is also what makes ranks
    deterministic.
    """
    rec = F.struct(
        F.col(order_col).alias("_o"),
        (-F.col(tiebreak_col)).alias("_nt"),
    )
    salt = F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(rec), asc=False), 1, k
            ).alias("_top")
        )
    )
    phase2 = (
        phase1.select(*keys, F.explode("_top").alias("_r"))
        .groupBy(*keys)
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_r"), asc=False), 1, k
            ).alias("_top")
        )
    )
    return phase2.select(
        *keys, F.posexplode("_top").alias("_pos", "_r")
    ).select(
        *keys,
        (-F.col("_r._nt")).alias(tiebreak_col),
        F.col("_r._o").alias(order_col),
        (F.col("_pos") + 1).cast("bigint").alias("rn"),
    )
