"""Parquet sink semantics (reference: utils/s3.py:37-63)."""

from __future__ import annotations

import os

from etl_procedure_codes_crawler_spark.sinks.parquet import (
    with_load_date,
    write_parquet_dataset,
    write_single_file_parquet,
)
from etl_procedure_codes_crawler_spark.sources.parquet import read_table_or_empty
from etl_procedure_codes_crawler_spark.schemas import PROCEDURE_MODIFIERS_SCHEMA


def _mods(spark, pairs):
    return spark.createDataFrame(pairs, PROCEDURE_MODIFIERS_SCHEMA)


def test_append_accumulates(spark, tmp_path):
    path = str(tmp_path / "mods")
    assert write_parquet_dataset(_mods(spark, [("25", "d1")]), path=path)
    assert write_parquet_dataset(_mods(spark, [("59", "d2")]), path=path)
    out = spark.read.parquet(path)
    assert sorted(r.modifier for r in out.collect()) == ["25", "59"]


def test_empty_write_skipped(spark, tmp_path):
    path = str(tmp_path / "empty")
    assert not write_parquet_dataset(_mods(spark, []), path=path)
    assert not os.path.exists(path)


def test_load_date_partitioning(spark, tmp_path):
    path = str(tmp_path / "partitioned")
    df = with_load_date(_mods(spark, [("25", "d1")]), load_date="20260813")
    write_parquet_dataset(df, path=path, partition_by=["load_date"])
    assert os.path.isdir(os.path.join(path, "load_date=20260813"))
    out = spark.read.parquet(path)
    assert out.filter(out.load_date == "20260813").count() == 1


def test_read_missing_table_yields_typed_empty(spark, tmp_path):
    df = read_table_or_empty(
        spark, str(tmp_path / "nope"), PROCEDURE_MODIFIERS_SCHEMA
    )
    assert df.schema == PROCEDURE_MODIFIERS_SCHEMA and df.count() == 0


def test_single_file_write(spark, tmp_path):
    path = str(tmp_path / "single")
    write_single_file_parquet(_mods(spark, [("25", "d1"), ("59", "d2")]), path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(path).count() == 2


class TestCompaction:
    def test_compact_reduces_file_count_preserves_rows(self, spark, sf_dir, tmp_path):
        import os

        from etl_procedure_codes_crawler_spark.sinks.parquet import compact_dataset
        from etl_procedure_codes_crawler_spark.sources.parquet import read_testdata

        path = str(tmp_path / "frag")
        orders = read_testdata(spark, sf_dir, "orders")
        # simulate many small incremental appends
        for _ in range(6):
            orders.limit(50).repartition(4).write.mode("append").parquet(path)
        before_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
        before_rows = spark.read.parquet(path).count()

        n_files = compact_dataset(spark, path, target_file_mb=128)

        assert n_files < before_files
        assert spark.read.parquet(path).count() == before_rows
        assert not os.path.exists(path + "._compacting")
        assert not os.path.exists(path + "._precompact")

    def test_compact_survives_stale_crash_leftovers(self, spark, tmp_path):
        """Stale ._compacting/._precompact from a crashed run must not
        make the rename-swap silently fail (rename returns False on an
        occupied destination)."""
        import os

        from etl_procedure_codes_crawler_spark.sinks.parquet import compact_dataset

        path = str(tmp_path / "frag")
        df = spark.range(100).withColumnRenamed("id", "v")
        for _ in range(3):
            df.repartition(4).write.mode("append").parquet(path)
        df.limit(1).write.parquet(path + "._compacting")
        df.limit(1).write.parquet(path + "._precompact")

        compact_dataset(spark, path, target_file_mb=128)
        assert spark.read.parquet(path).count() == 300
        assert not os.path.exists(path + "._compacting")
        assert not os.path.exists(path + "._precompact")


class TestIdempotentRunWrites:
    def test_rerun_replaces_own_partition_only(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.sinks.parquet import (
            write_idempotent_run,
        )
        from etl_procedure_codes_crawler_spark.sources.parquet import read_testdata

        path = str(tmp_path / "runs")
        orders = read_testdata(spark, sf_dir, "orders")
        write_idempotent_run(orders.limit(100), path, run_id="r1")
        write_idempotent_run(orders.limit(50), path, run_id="r2")
        # retry of r1 with fewer rows: must REPLACE r1, leave r2 alone
        write_idempotent_run(orders.limit(70), path, run_id="r1")

        by_run = {
            r.run_id: r.n
            for r in spark.read.parquet(path)
            .groupBy("run_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert by_run == {"r1": 70, "r2": 50}

    def test_empty_frame_skips_write(self, spark, tmp_path):
        import os

        from etl_procedure_codes_crawler_spark.schemas import CODES_INPUT_SCHEMA
        from etl_procedure_codes_crawler_spark.sinks.parquet import (
            write_idempotent_run,
        )

        path = str(tmp_path / "runs")
        empty = spark.createDataFrame([], CODES_INPUT_SCHEMA)
        assert write_idempotent_run(empty, path, run_id="r1") is False
        assert not os.path.exists(path)


class TestPartitionPruning:
    def test_partitioned_scan_prunes(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from etl_procedure_codes_crawler_spark.sources.parquet import read_testdata

        from etl_procedure_codes_crawler_spark.functions.timestamps import (
            normalize_event_ts,
        )

        path = str(tmp_path / "events_by_day")
        events = normalize_event_ts(
            read_testdata(spark, sf_dir, "events")
        ).withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        events.write.partitionBy("day").parquet(path)

        days = sorted(r.day for r in spark.read.parquet(path).select("day").distinct().collect())
        one_day = spark.read.parquet(path).filter(F.col("day") == days[0])
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        # partition filter must reach the scan: only 1 of N day-dirs read
        assert "PartitionFilters: [isnotnull(day" in plan, plan
        n_parts = one_day.select(F.input_file_name()).distinct().count()
        all_parts = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
        assert n_parts < all_parts


class TestSchemaEvolution:
    def test_merge_schema_reads_evolving_dataset(self, spark, tmp_path):
        """Appends with added columns are the normal life of a 100TB
        dataset; mergeSchema must surface the union schema with NULLs
        for pre-evolution files."""
        path = str(tmp_path / "evolving")
        spark.createDataFrame(
            [("a", 1)], "code string, v1 long"
        ).write.mode("append").parquet(path)
        spark.createDataFrame(
            [("b", 2, "extra")], "code string, v1 long, v2 string"
        ).write.mode("append").parquet(path)

        merged = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(merged.columns) == {"code", "v1", "v2"}
        rows = {r.code: r.v2 for r in merged.collect()}
        assert rows == {"a": None, "b": "extra"}


class TestCompactionRound5:
    def test_partitioned_compaction_counts_files_recursively(
        self, spark, tmp_path
    ):
        """listStatus is non-recursive: with partition_by the data
        files live under partition dirs and the pre-fix count was 0."""
        import os

        from etl_procedure_codes_crawler_spark.sinks.parquet import compact_dataset

        path = str(tmp_path / "frag")
        df = spark.range(200).selectExpr("id AS v", "id % 3 AS part")
        for _ in range(3):
            df.repartition(4).write.mode("append").partitionBy(
                "part"
            ).parquet(path)

        n_files = compact_dataset(
            spark, path, target_file_mb=128, partition_by=["part"]
        )
        assert n_files >= 3  # at least one file per partition value
        assert spark.read.parquet(path).count() == 600
        assert sorted(
            d for d in os.listdir(path) if d.startswith("part=")
        ) == ["part=0", "part=1", "part=2"]

    def test_compact_crash_window_recovers_original(self, spark, tmp_path):
        """Crash after src was renamed to ._precompact but before the
        compacted copy moved in: the next call must restore the
        original, not fail or discard it."""
        import shutil

        from etl_procedure_codes_crawler_spark.sinks.parquet import compact_dataset

        path = str(tmp_path / "frag")
        df = spark.range(120).withColumnRenamed("id", "v")
        for _ in range(3):
            df.repartition(4).write.mode("append").parquet(path)
        # simulate the window: dataset moved aside, replacement missing
        shutil.move(path, path + "._precompact")

        compact_dataset(spark, path, target_file_mb=128)
        assert spark.read.parquet(path).count() == 360
