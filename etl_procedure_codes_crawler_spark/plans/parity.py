"""Local replica of the driver's Spark-vs-DuckDB correctness compare.

Used by tests (and by hand) to catch oracle drift before the driver
does: runs the registered Spark plan and its ANSI oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from ..schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for table in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_value(value):
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # exact doubles expected cross-engine (decimal-exact math);
        # repr keeps full precision so ulp drift is VISIBLE, not hidden
        return repr(value)
    if isinstance(value, bool):
        return str(value)
    return str(value)


def _canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    return sorted(canon)


def compare_query(
    spark: SparkSession, sf_dir: str, plan_fn, oracle_sql: str
) -> dict:
    """Run plan + oracle; return a comparison report dict."""
    spark_df = plan_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_df = con.execute(oracle_sql).df()
    finally:
        con.close()

    report = {
        "spark_rows": len(spark_df),
        "oracle_rows": len(oracle_df),
        "spark_columns": sorted(spark_df.columns),
        "oracle_columns": sorted(oracle_df.columns),
    }
    report["rows_match"] = report["spark_rows"] == report["oracle_rows"]
    report["columns_match"] = report["spark_columns"] == report["oracle_columns"]

    spark_rows = _canon_rows(
        list(spark_df.columns), spark_df.where(spark_df.notna(), None).values.tolist()
    )
    oracle_rows = _canon_rows(
        list(oracle_df.columns), oracle_df.where(oracle_df.notna(), None).values.tolist()
    )
    report["values_match"] = spark_rows == oracle_rows
    if not report["values_match"]:
        # multiset diff, not positional zip: one extra row at the top
        # of the sorted order would misalign every later pair and point
        # debugging at rows that actually match
        from collections import Counter

        s_extra = Counter(map(tuple, spark_rows)) - Counter(
            map(tuple, oracle_rows)
        )
        o_extra = Counter(map(tuple, oracle_rows)) - Counter(
            map(tuple, spark_rows)
        )
        report["only_in_spark"] = list(s_extra.elements())[:5]
        report["only_in_oracle"] = list(o_extra.elements())[:5]
    return report
