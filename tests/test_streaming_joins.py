"""Stream-stream join + streaming dedup (streaming/joins.py), checked
against their batch equivalents on the real events data."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.streaming.events import read_events_stream
from etl_procedure_codes_crawler_spark.streaming.joins import (
    dedup_stream,
    join_views_to_purchases,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    directory = tmp_path_factory.mktemp("ss_join_events")
    shutil.copy(f"{sf_dir}/events.parquet", directory / "part-000.parquet")
    return str(directory)


def _drain(df, name: str):
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    query.stop()


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    _drain(join_views_to_purchases(views, purchases), "ss_join")

    streamed = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT purchase_id, view_id FROM ss_join").collect()
    }

    # batch equivalent: plain self-join with the same range condition
    from etl_procedure_codes_crawler_spark.functions.timestamps import (
        normalize_event_ts,
    )

    batch = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    v = batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    p = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    expected = {
        (r.pid, r.vid)
        for r in v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.col("pts") >= F.col("vts"))
            & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert streamed == expected
    assert streamed  # data actually joins at this scale


def test_streaming_dedup_emits_each_key_once(spark, events_dir, tmp_path):
    # duplicate the single input file: every event arrives twice
    shutil.copy(f"{events_dir}/part-000.parquet", f"{events_dir}/../dup.parquet")
    dup_dir = str(tmp_path / "dupes")
    import os

    os.mkdir(dup_dir)
    shutil.copy(f"{events_dir}/part-000.parquet", f"{dup_dir}/a.parquet")
    shutil.copy(f"{events_dir}/part-000.parquet", f"{dup_dir}/b.parquet")

    stream = read_events_stream(spark, dup_dir)
    _drain(dedup_stream(stream), "ss_dedup")

    n_unique = (
        spark.read.parquet(f"{dup_dir}/a.parquet").select("event_id").distinct().count()
    )
    emitted = spark.sql("SELECT event_id FROM ss_dedup").collect()
    assert len(emitted) == n_unique  # each id exactly once despite 2× input
