"""load()'s semantics pins are scoped: read-only for correctly-pinned
sessions (no per-query conf.set churn), corrective for foreign or
mutated sessions (plans/relational.py::_pin_conf)."""

from __future__ import annotations

from etl_procedure_codes_crawler_spark.plans import relational as R


class _RecordingConf:
    def __init__(self, values):
        self.values = dict(values)
        self.sets = []

    def get(self, key, default=None):
        return self.values.get(key, default)

    def set(self, key, value):
        self.sets.append((key, value))
        self.values[key] = value


class _FakeSpark:
    def __init__(self, values):
        self.conf = _RecordingConf(values)


def test_pin_is_readonly_when_already_correct():
    fake = _FakeSpark({"spark.sql.session.timeZone": "UTC"})
    R._pin_conf(fake, "spark.sql.session.timeZone", "UTC")
    assert fake.conf.sets == []


def test_pin_corrects_foreign_or_mutated_session():
    fake = _FakeSpark({"spark.sql.session.timeZone": "Asia/Kolkata"})
    R._pin_conf(fake, "spark.sql.session.timeZone", "UTC")
    assert fake.conf.sets == [("spark.sql.session.timeZone", "UTC")]
    fake2 = _FakeSpark({})  # foreign session without the conf at all
    R._pin_conf(fake2, "spark.sql.ansi.enabled", "true")
    assert fake2.conf.sets == [("spark.sql.ansi.enabled", "true")]


def test_load_does_not_reset_confs_in_our_own_session(spark, sf_dir):
    """Steady state: a get_spark session runs load() with ZERO conf
    mutations (a set would invalidate cached plan state per query)."""
    real_set = spark.conf.set
    calls = []

    def recording_set(key, value):
        calls.append((key, value))
        real_set(key, value)

    spark.conf.set = recording_set
    try:
        R.load(spark, sf_dir, "lineitem")
        R.load(spark, sf_dir, "events")
    finally:
        spark.conf.set = real_set
    assert calls == [], calls
