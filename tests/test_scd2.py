"""SCD Type-2 apply + time travel (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.operators.scd import as_of, scd2_apply

SCHEMA = "code string, description string, effective_ts timestamp"


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _updates(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_versions_accumulate_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "scd")
    scd2_apply(spark, path, _updates(spark, [("A", "v1", _ts(1)), ("B", "b1", _ts(1))]), "code")
    scd2_apply(spark, path, _updates(spark, [("A", "v2", _ts(5))]), "code")
    scd2_apply(spark, path, _updates(spark, [("A", "v3", _ts(9)), ("C", "c1", _ts(9))]), "code")

    full = spark.read.parquet(path)
    assert full.count() == 5  # A×3 + B + C

    # current snapshot
    current = {r.code: r.description for r in full.filter(F.col("valid_to").isNull()).collect()}
    assert current == {"A": "v3", "B": "b1", "C": "c1"}

    # history chain for A is contiguous: valid_to of v1 == valid_from of v2
    a = sorted(
        full.filter(F.col("code") == "A").collect(), key=lambda r: r.valid_from
    )
    assert [r.description for r in a] == ["v1", "v2", "v3"]
    assert a[0].valid_to == a[1].valid_from and a[1].valid_to == a[2].valid_from

    # time travel
    assert {r.code: r.description for r in as_of(spark, path, _ts(2)).collect()} == {
        "A": "v1",
        "B": "b1",
    }
    assert {r.code: r.description for r in as_of(spark, path, _ts(6)).collect()} == {
        "A": "v2",
        "B": "b1",
    }


def test_noop_update_creates_no_version(spark, tmp_path):
    path = str(tmp_path / "scd")
    scd2_apply(spark, path, _updates(spark, [("A", "same", _ts(1))]), "code")
    n = scd2_apply(spark, path, _updates(spark, [("A", "same", _ts(5))]), "code")
    assert n == 1  # unchanged attributes → no new version, no close


def test_null_attribute_transitions(spark, tmp_path):
    # NULL→value and value→NULL must both count as changes
    path = str(tmp_path / "scd")
    scd2_apply(spark, path, _updates(spark, [("A", None, _ts(1))]), "code")
    scd2_apply(spark, path, _updates(spark, [("A", "filled", _ts(2))]), "code")
    n = scd2_apply(spark, path, _updates(spark, [("A", None, _ts(3))]), "code")
    assert n == 3
    current = spark.read.parquet(path).filter(F.col("valid_to").isNull()).collect()
    assert len(current) == 1 and current[0].description is None


def test_duplicate_update_keys_rejected(spark, tmp_path):
    path = str(tmp_path / "scd")
    with pytest.raises(ValueError, match="duplicate keys"):
        scd2_apply(
            spark,
            path,
            _updates(spark, [("A", "x", _ts(1)), ("A", "y", _ts(1))]),
            "code",
        )
