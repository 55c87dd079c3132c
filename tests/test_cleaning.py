"""P1-P3 cleaning semantics (reference: procedure_code.py:721-723)."""

from __future__ import annotations

from etl_procedure_codes_crawler_spark.operators.cleaning import (
    clean_codes,
    clean_key_column,
)
from etl_procedure_codes_crawler_spark.schemas import CODES_INPUT_SCHEMA


def _codes_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], CODES_INPUT_SCHEMA)


def test_blank_and_false_and_null_dropped(spark):
    df = _codes_df(
        spark,
        ["0001U", "", "   ", "false", "FALSE ", " False", None, "J0120"],
    )
    out = sorted(r.code for r in clean_key_column(df).collect())
    assert out == ["0001U", "J0120"]


def test_valid_codes_pass_through_untrimmed(spark):
    # P1/P2 only nullify; they do not trim surviving values (the
    # reference's .loc assignment leaves non-matching rows untouched).
    df = _codes_df(spark, [" 99213 "])
    assert clean_key_column(df).collect()[0].code == " 99213 "


def test_other_columns_preserved(spark):
    df = spark.createDataFrame(
        [("0001U", 1), ("", 2), ("false", 3)], "code string, extra int"
    )
    rows = clean_key_column(df).collect()
    assert [(r.code, r.extra) for r in rows] == [("0001U", 1)]


def test_clean_codes_dedups_within_batch(spark):
    df = _codes_df(spark, ["0001U", "0001U", "J0120", "", "false"])
    out = sorted(r.code for r in clean_codes(df).collect())
    assert out == ["0001U", "J0120"]


def test_clean_codes_empty_input_keeps_schema(spark):
    df = spark.createDataFrame([], CODES_INPUT_SCHEMA)
    out = clean_codes(df)
    assert out.schema == CODES_INPUT_SCHEMA
    assert out.count() == 0
