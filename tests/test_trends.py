"""user_value_trends: the closed-form decimal OLS (oracled gate
query) and the applyInPandas/polyfit grouped-map must be the same
regression."""

from __future__ import annotations

import datetime as dt

from etl_procedure_codes_crawler_spark.llm.queries import (
    user_value_trends_q,
)
from etl_procedure_codes_crawler_spark.llm.trends import user_value_trends


def test_closed_form_matches_polyfit_on_testdata(spark, sf_dir):
    closed = {
        r.user_id: r for r in user_value_trends_q(spark, sf_dir).collect()
    }
    from etl_procedure_codes_crawler_spark.plans.relational import load

    fitted = {
        r.user_id: r
        for r in user_value_trends(load(spark, sf_dir, "events")).collect()
    }
    assert set(closed) == set(fitted)
    for uid, c in closed.items():
        f = fitted[uid]
        assert c.n_events == f.n_events
        # polyfit output is rounded to 6 dp; allow that plus fp noise
        assert abs(c.value_per_hour - f.value_per_hour) < 1e-4, uid
        assert abs(c.intercept - f.intercept) < 1e-4, uid


def test_degenerate_groups_slope_zero_intercept_mean(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # single-event user: no fit possible
        (1, base, 10.0),
        # two events at the SAME timestamp: dx == 0
        (2, base, 4.0),
        (2, base, 8.0),
        # a real trend: value = 2 per hour starting at 1
        (3, base, 1.0),
        (3, base + dt.timedelta(hours=1), 3.0),
        (3, base + dt.timedelta(hours=2), 5.0),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    out = {r.user_id: r for r in user_value_trends(events).collect()}
    assert out[1].value_per_hour == 0.0 and out[1].intercept == 10.0
    assert out[2].value_per_hour == 0.0 and out[2].intercept == 6.0
    assert abs(out[3].value_per_hour - 2.0) < 1e-9
    assert abs(out[3].intercept - 1.0) < 1e-9
