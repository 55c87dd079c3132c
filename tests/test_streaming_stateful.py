"""applyInPandasWithState: running per-user profiles with bounded state."""

from __future__ import annotations

import shutil

import pytest

from etl_procedure_codes_crawler_spark.plans.relational import load
from etl_procedure_codes_crawler_spark.streaming import events as E
from etl_procedure_codes_crawler_spark.streaming.stateful import (
    user_profiles_stateful,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    directory = tmp_path_factory.mktemp("events_stateful")
    shutil.copy(f"{sf_dir}/events.parquet", directory / "part-000.parquet")
    return str(directory)


def test_stateful_profiles_match_batch_aggregation(spark, sf_dir, events_dir):
    stream = E.read_events_stream(spark, events_dir)
    profiles = user_profiles_stateful(stream)
    query = (
        profiles.writeStream.format("memory")
        .queryName("profiles_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    try:
        # update-mode: keep the LAST emitted row per user
        streamed = spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY n_events DESC) AS rn
              FROM profiles_test
            ) WHERE rn = 1
            """
        ).collect()
        s = {r.user_id: (r.n_events, r.total_value) for r in streamed}

        from pyspark.sql import functions as F

        batch = (
            load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("tv"),
            )
            .collect()
        )
        b = {r.user_id: (r.n, r.tv) for r in batch}
        assert set(s) == set(b)
        for user, (n, tv) in b.items():
            assert s[user][0] == n
            assert abs(s[user][1] - tv) < 0.02  # float sum ordering slack
    finally:
        query.stop()
