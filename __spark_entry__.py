"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-join/agg/top-k plan at sf0.001;
``queries``/``oracle_sql`` expose the full registered corpus (relational
operators from SURVEY §2 + the LLM-pipeline operators) with their
DuckDB oracles for the driver's hash-compare.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# executors import the package by reference
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def _registry():
    from etl_procedure_codes_crawler_spark.plans import relational

    try:  # beyond-reference operator families register on import
        from etl_procedure_codes_crawler_spark.llm import queries as _llm  # noqa: F401
    except ImportError:
        pass
    return relational.QUERIES, relational.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    # legacy-encoding tolerance only; actual ts dtype is inspected at
    # load (etl_procedure_codes_crawler_spark/functions/timestamps.py)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    queries, _ = _registry()
    return queries["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registered, _ = _registry()
    return dict(registered)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omissions get the weaker
    rows-only check (non-SQL-expressible ops only)."""
    _, oracles = _registry()
    return dict(oracles)
