"""Grouped-map analytics via batch ``applyInPandas``.

The remaining Arrow surface: per-group pandas/numpy computation where
each group needs its whole slice at once (model fits, per-entity
curves) — inexpressible as an aggregate without UDAF machinery.
``applyInPandas`` shuffles once on the group key and hands each group
to vectorized numpy; at 100 TB the constraint to respect is that ONE
GROUP must fit in executor memory (per-user/event-type slices do;
never group by a low-cardinality key here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

TREND_SCHEMA = (
    "user_id long, n_events long, value_per_hour double, intercept double"
)


def _fit_trend(group: pd.DataFrame) -> pd.DataFrame:
    """Least-squares slope of value over event time for one user.

    Sorted HERE, inside the grouped-map fn: rows arrive in
    shuffle-fetch order (a sortWithinPartitions before the groupBy
    does not survive the exchange), and polyfit's floating-point
    accumulation order must be fixed for run-to-run determinism."""
    group = group.sort_values(["ts"], kind="stable")
    hours = group["ts"].astype("int64").to_numpy() / 1e9 / 3600.0
    values = group["value"].to_numpy(dtype="float64")
    if len(group) >= 2 and np.ptp(hours) > 0:
        slope, intercept = np.polyfit(hours - hours.min(), values, 1)
    else:
        slope, intercept = 0.0, float(values.mean()) if len(values) else 0.0
    return pd.DataFrame(
        {
            "user_id": [int(group["user_id"].iloc[0])],
            "n_events": [len(group)],
            "value_per_hour": [round(float(slope), 6)],
            "intercept": [round(float(intercept), 6)],
        }
    )


def user_value_trends(events: DataFrame) -> DataFrame:
    """Per-user value-over-time regression: one shuffle on user_id,
    one numpy fit per group, deterministic (the grouped-map fn sorts
    its slice; pre-shuffle order cannot survive the exchange)."""
    ordered = events.select("user_id", "ts", "value").sortWithinPartitions(
        "user_id", "ts"
    )
    return ordered.groupBy("user_id").applyInPandas(_fit_trend, TREND_SCHEMA)
