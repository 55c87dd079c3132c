"""Single-pass data profiler: per-column stats in long format.

Profiling 100 TB must not run one job per column — this computes all
requested columns' stats in ONE aggregation pass (count / nulls /
distinct / min / max per column as parallel agg expressions), then
unpivots the 1-row wide result into (column, stat) long format with
``stack`` — driver never loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``;
    min/max rendered as strings so heterogeneous column types coexist.
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )
