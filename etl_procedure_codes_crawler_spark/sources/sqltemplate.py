"""Parameterized SQL templates (SURVEY §2.1 S8).

Reference: ``crawler/src/procedure_code.py:686-701`` reads ``.sql``
files and interpolates env values with ``str.format`` — stringly-typed
and injection-prone (a LOGICAL_DATE of ``'); DROP TABLE --`` becomes
SQL). Spark ≥3.4 named parameters bind values server-side
(``spark.sql(text, args={...})`` with ``:name`` placeholders), so the
query text is static and values are typed literals, never spliced
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_sql_template(path: str) -> str:
    """Read a ``.sql`` file verbatim (placeholders intact)."""
    with open(path, encoding="utf-8") as handle:
        return handle.read()


def run_sql_template(
    spark: SparkSession,
    template: str,
    params: dict[str, object] | None = None,
    from_file: bool = False,
) -> DataFrame:
    """Execute a SQL template with named-parameter binding.

    ``template`` is SQL text, or a path when ``from_file``. Parameters
    appear as ``:name`` in the text and are bound as typed values —
    the safe replacement for the reference's ``.format`` interpolation.
    """
    text = load_sql_template(template) if from_file else template
    return spark.sql(text, args=params or {})
