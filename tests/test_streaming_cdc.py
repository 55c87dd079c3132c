"""Streaming CDC apply (streaming/cdc.py): ordered per-key reduction +
continuous merge with tombstone deletes."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest

from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_procedure_codes_crawler_spark.streaming.cdc import (
    latest_change_per_key,
    stream_cdc_upsert,
)

CDC_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("value", StringType()),
        StructField("seq", LongType()),
        StructField("deleted", BooleanType()),
    ]
)


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    return {
        "src": str(src),
        "target": str(tmp_path / "warehouse"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _drop(spark, src: str, name: str, rows):
    staging = tempfile.mkdtemp()
    spark.createDataFrame(rows, CDC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    shutil.copy(
        glob.glob(os.path.join(staging, "part-*.parquet"))[0],
        os.path.join(src, f"{name}.parquet"),
    )
    shutil.rmtree(staging, ignore_errors=True)


def _run(spark, dirs):
    query = stream_cdc_upsert(
        spark,
        dirs["src"],
        CDC_SCHEMA,
        dirs["target"],
        key="code",
        order_col="seq",
        checkpoint_dir=dirs["ckpt"],
        delete_col="deleted",
    )
    query.awaitTermination(180)
    query.stop()


def _state(spark, dirs):
    return {
        r.code: r.value for r in spark.read.parquet(dirs["target"]).collect()
    }


def test_latest_change_per_key_orders_within_batch(spark):
    changes = spark.createDataFrame(
        [("A", "old", 1, False), ("A", "new", 3, False), ("A", "mid", 2, False)],
        CDC_SCHEMA,
    )
    rows = latest_change_per_key(changes, "code", "seq").collect()
    assert len(rows) == 1 and rows[0].value == "new"


def test_latest_change_tie_break_is_deterministic(spark):
    """Two changes for one key sharing order_col must resolve to the
    same winner on every (re)execution — replay idempotence depends on
    it. The full-row tie-break picks the max over remaining columns."""
    rows = [("A", "x", 5, False), ("A", "y", 5, False), ("A", "w", 5, True)]
    winners = set()
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        changes = spark.createDataFrame(perm, CDC_SCHEMA).repartition(3)
        got = latest_change_per_key(changes, "code", "seq").collect()
        assert len(got) == 1
        winners.add(got[0].value)
    assert winners == {"y"}  # desc tie-break on value: y > x > w


def test_cdc_stream_applies_inserts_updates_deletes(spark, dirs):
    # batch 1: create A and B (A updated twice inside the batch)
    _drop(
        spark,
        dirs["src"],
        "c1",
        [("A", "a1", 1, False), ("A", "a2", 2, False), ("B", "b1", 3, False)],
    )
    _run(spark, dirs)
    assert _state(spark, dirs) == {"A": "a2", "B": "b1"}

    # batch 2: update B, delete A, insert C
    _drop(
        spark,
        dirs["src"],
        "c2",
        [("B", "b2", 4, False), ("A", None, 5, True), ("C", "c1", 6, False)],
    )
    _run(spark, dirs)
    assert _state(spark, dirs) == {"B": "b2", "C": "c1"}


def test_cdc_replay_is_idempotent(spark, dirs):
    _drop(spark, dirs["src"], "c1", [("A", "a1", 1, False)])
    _run(spark, dirs)
    # lost checkpoint → full replay of the same change file
    replay = dict(dirs, ckpt=dirs["ckpt"] + "_2")
    _run(spark, replay)
    assert _state(spark, dirs) == {"A": "a1"}
