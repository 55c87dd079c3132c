"""Native Spark column helpers for the reference's scalar functions.

These are the ⊕-marked rows of SURVEY §2.6 — scalar semantics that,
once data is columnar, should run JVM-side inside whole-stage codegen
rather than in Python. The HTML-tree-walking extractors live in
``html_extract`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_whitespace(col: Column | str) -> Column:
    """F20: collapse runs of whitespace to single spaces and trim.

    Reference: ``' '.join(text.split())`` at procedure_code.py:70,82,108.
    """
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def classify_code_type(url: Column | str) -> Column:
    """F21: 'CPT' if the URL mentions cpt else 'HCPCS'.

    Reference: procedure_code.py:550, :602.
    """
    return F.when(
        F.lower(_c(url)).contains("cpt"), F.lit("CPT")
    ).otherwise(F.lit("HCPCS"))


def after_first_comma(col: Column | str) -> Column:
    """F2 core: text after the first comma, trimmed (short_description)."""
    c = _c(col)
    return F.when(
        c.contains(","),
        F.trim(F.substring(c, F.instr(c, ",") + 1, F.length(c))),
    ).otherwise(c)


def after_last_colon(col: Column | str) -> Column:
    """F16 core: text after the last ':' (cpt_code_symbols entries)."""
    return F.trim(F.substring_index(_c(col), ":", -1))


def strip_dots(col: Column | str) -> Column:
    """F13 core: remove '.' from ICD-10 codes (procedure_code.py:397)."""
    return F.translate(_c(col), ".", "")


def yyyymmdd_today() -> Column:
    """F22: load-date stamp (procedure_code.py:780, utils/s3.py:37).

    Emitted as a partition column rather than a filename prefix.
    """
    return F.date_format(F.current_date(), "yyyyMMdd")


def extract_cpt_range(href: Column | str) -> Column:
    """F5 (CPT branch): range token from a /cpt-codes-range/ href."""
    return F.regexp_extract(_c(href), r"/cpt-codes-range/(\d{4,5}T?-\d{4,5}T?)/", 1)


def extract_hcpcs_range(text: Column | str) -> Column:
    """F5 (HCPCS branch): ``A0000-A9999``-shaped token from span text."""
    return F.regexp_extract(_c(text), r"\b([A-Z]\d{4}-[A-Z]\d{4})\b", 1)
