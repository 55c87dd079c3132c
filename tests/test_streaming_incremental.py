"""Streaming incremental append: checkpoint durability + replay
idempotency (streaming/incremental.py)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_procedure_codes_crawler_spark.streaming.incremental import (
    stream_incremental_append,
)

SCHEMA = StructType(
    [StructField("code", StringType()), StructField("payload", LongType())]
)


@pytest.fixture()
def dirs(tmp_path):
    source = tmp_path / "incoming"
    source.mkdir()
    return {
        "source": str(source),
        "warehouse": str(tmp_path / "warehouse"),
        "checkpoint": str(tmp_path / "ckpt"),
    }


def _drop(spark, source_dir: str, name: str, rows):
    # stage as a single flat file — the file stream lists files, it
    # does not recurse into per-write dataset directories
    import glob
    import shutil
    import tempfile

    staging = tempfile.mkdtemp()
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(source_dir, f"{name}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def _run(spark, dirs):
    query = stream_incremental_append(
        spark,
        dirs["source"],
        SCHEMA,
        dirs["warehouse"],
        key="code",
        checkpoint_dir=dirs["checkpoint"],
    )
    query.awaitTermination(120)
    query.stop()


def test_first_run_dedups_within_batch(spark, dirs):
    _drop(spark, dirs["source"], "f1", [("a", 1), ("b", 2), ("a", 3)])
    _run(spark, dirs)
    rows = spark.read.parquet(dirs["warehouse"]).collect()
    assert sorted(r.code for r in rows) == ["a", "b"]


def test_new_files_append_only_new_keys(spark, dirs):
    _drop(spark, dirs["source"], "f1", [("a", 1), ("b", 2)])
    _run(spark, dirs)
    # overlap key 'b'; new key 'c'
    _drop(spark, dirs["source"], "f2", [("b", 9), ("c", 3)])
    _run(spark, dirs)
    rows = {r.code: r.payload for r in spark.read.parquet(dirs["warehouse"]).collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}  # b kept its ORIGINAL payload


def test_checkpoint_prevents_reprocessing(spark, dirs):
    _drop(spark, dirs["source"], "f1", [("a", 1)])
    _run(spark, dirs)
    before = spark.read.parquet(dirs["warehouse"]).count()
    # no new files: a restarted query with the same checkpoint is a no-op
    _run(spark, dirs)
    assert spark.read.parquet(dirs["warehouse"]).count() == before


def test_replayed_batch_is_idempotent(spark, dirs):
    """Simulate the crash-between-write-and-commit window: same data
    processed twice (fresh checkpoint = full replay) must not
    double-append thanks to the per-batch anti-join."""
    _drop(spark, dirs["source"], "f1", [("a", 1), ("b", 2)])
    _run(spark, dirs)
    replay = dict(dirs, checkpoint=dirs["checkpoint"] + "_2")  # lost checkpoint
    _run(spark, replay)
    rows = spark.read.parquet(dirs["warehouse"]).collect()
    assert sorted(r.code for r in rows) == ["a", "b"]
