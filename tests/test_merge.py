"""merge_upsert: latest-wins key merge with delete support."""

from __future__ import annotations

import pytest

from etl_procedure_codes_crawler_spark.operators.merge import merge_upsert

SCHEMA = "code string, value long"
SCHEMA_DEL = "code string, value long, deleted boolean"


def _read(spark, path):
    return {r.code: r.value for r in spark.read.parquet(path).collect()}


def test_insert_update_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], SCHEMA
    ).write.parquet(path)

    n = merge_upsert(
        spark,
        path,
        spark.createDataFrame(
            [("b", 20, False), ("d", 4, False), ("c", 0, True)], SCHEMA_DEL
        ),
        key="code",
        delete_col="deleted",
    )
    assert n == 3
    assert _read(spark, path) == {"a": 1, "b": 20, "d": 4}  # c deleted


def test_merge_into_missing_target_is_insert_all(spark, tmp_path):
    path = str(tmp_path / "fresh")
    merge_upsert(
        spark, path, spark.createDataFrame([("x", 1)], SCHEMA), key="code"
    )
    assert _read(spark, path) == {"x": 1}


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], SCHEMA).write.parquet(path)
    updates = spark.createDataFrame([("a", 9), ("b", 2)], SCHEMA)
    merge_upsert(spark, path, updates, key="code")
    merge_upsert(spark, path, updates, key="code")  # replay
    assert _read(spark, path) == {"a": 9, "b": 2}


def test_duplicate_update_keys_rejected(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], SCHEMA).write.parquet(path)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(
            spark,
            path,
            spark.createDataFrame([("b", 1), ("b", 2)], SCHEMA),
            key="code",
        )
    # target untouched after the rejected merge
    assert _read(spark, path) == {"a": 1}


def test_no_leftover_temp_dirs(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], SCHEMA).write.parquet(path)
    merge_upsert(spark, path, spark.createDataFrame([("b", 2)], SCHEMA), "code")
    siblings = os.listdir(str(tmp_path))
    assert siblings == ["t"], siblings
