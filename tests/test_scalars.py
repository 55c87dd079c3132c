"""Column-level scalar helpers (SURVEY §2.6 ⊕ rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.functions import scalars


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_normalize_whitespace(spark):
    c = scalars.normalize_whitespace(F.lit("  a\t b\n\nc  "))
    assert _one(spark, c) == "a b c"


def test_classify_code_type(spark):
    assert _one(spark, scalars.classify_code_type(F.lit("https://x/CPT/99213"))) == "CPT"
    assert _one(spark, scalars.classify_code_type(F.lit("https://x/hcpcs/J0120"))) == "HCPCS"


def test_after_first_comma(spark):
    assert _one(spark, scalars.after_first_comma(F.lit("99213, Office visit, est"))) == "Office visit, est"
    assert _one(spark, scalars.after_first_comma(F.lit("no comma"))) == "no comma"


def test_after_last_colon(spark):
    assert _one(spark, scalars.after_last_colon(F.lit("Symbol: New code"))) == "New code"


def test_strip_dots(spark):
    assert _one(spark, scalars.strip_dots(F.lit("A12.34"))) == "A1234"


def test_extract_ranges(spark):
    assert (
        _one(spark, scalars.extract_cpt_range(F.lit("/medical-coding/cpt-codes-range/0010T-0029T/x")))
        == "0010T-0029T"
    )
    assert (
        _one(spark, scalars.extract_hcpcs_range(F.lit("HCPCS Codes J0120-J0125 list")))
        == "J0120-J0125"
    )
