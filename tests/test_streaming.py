"""Structured Streaming over events: windows, watermark, sessions.

The stream is driven with availableNow over the real testdata parquet,
and the windowed result is cross-checked against the BATCH version of
the same aggregation — stream/batch parity is the correctness bar.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.plans.relational import QUERIES, load
from etl_procedure_codes_crawler_spark.streaming import events as E


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-source streams require a DIRECTORY; stage the single parquet
    # file into one (also how new files would arrive in production)
    import shutil

    directory = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", directory / "part-000.parquet")
    return str(directory)


def test_stream_hourly_matches_batch(spark, sf_dir, events_dir):
    stream = E.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    query = E.run_to_memory(E.hourly_event_counts(stream), "hourly_test")
    try:
        streamed = spark.sql(
            "SELECT date_format(window_start, 'yyyy-MM-dd HH:mm:ss') AS ws,"
            "       event_type, n_events, sum_value FROM hourly_test"
        ).collect()
        batch = QUERIES["events_hourly_windows"](spark, sf_dir).collect()
        s = {(r.ws, r.event_type): (r.n_events, r.sum_value) for r in streamed}
        b = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in batch
        }
        assert s == b
    finally:
        query.stop()


def test_sliding_windows_overlap(spark, events_dir):
    stream = E.read_events_stream(spark, events_dir)
    query = E.run_to_memory(E.sliding_value_averages(stream), "sliding_test")
    try:
        rows = spark.sql("SELECT * FROM sliding_test").collect()
        # every event lands in exactly 2 overlapping 1h/30m windows →
        # total n_events across sliding windows = 2 × event count
        total = sum(r.n_events for r in rows)
        n_events = spark.sql(
            "SELECT count(*) AS n FROM parquet.`{}`".format(events_dir)
        ).collect()[0].n
        assert total == 2 * n_events
    finally:
        query.stop()


def test_session_windows(spark, sf_dir, events_dir):
    stream = E.read_events_stream(spark, events_dir)
    query = E.run_to_memory(E.user_session_windows(stream), "session_test")
    try:
        rows = spark.sql("SELECT * FROM session_test").collect()
        assert len(rows) > 0
        # sessions are per-user, non-overlapping, and cover all events
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for sessions in by_user.values():
            sessions.sort(key=lambda r: r.session_start)
            for prev, cur in zip(sessions, sessions[1:]):
                assert prev.session_end <= cur.session_start
        total = sum(r.n_events for r in rows)
        batch_events = load(spark, sf_dir, "events")
        assert total == batch_events.count()
    finally:
        query.stop()
