"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the declarative window/session operators can't express —
running per-key accumulators, custom timeout logic — Structured
Streaming exposes arbitrary state. Example operator here: a per-user
running profile (event count, value sum, last-seen) emitted on every
update, with idle-timeout eviction so state stays bounded.

Arrow-batched per key-group; state is a single compact tuple per user.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_profile(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n_events, total_value, last_seen_us = state.get
    else:
        n_events, total_value, last_seen_us = 0, 0.0, 0
    for batch in batches:
        n_events += len(batch)
        total_value += float(batch["value"].sum())
        batch_max_us = int(batch["ts"].astype("int64").max() // 1000)
        last_seen_us = max(last_seen_us, batch_max_us)
    state.update((n_events, total_value, last_seen_us))
    # bound state: evict profiles idle for an hour of processing time
    state.setTimeoutDuration(60 * 60 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [round(total_value, 2)],
            "last_seen": [pd.Timestamp(last_seen_us, unit="us")],
        }
    )


def user_profiles_stateful(events: DataFrame) -> DataFrame:
    """Running per-user profile over an event stream.

    State per user is 3 scalars; the processing-time timeout evicts
    idle users, so state size tracks the active-user set, not history.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
