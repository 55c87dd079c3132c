"""Property test: asof_join ≡ pandas.merge_asof on random inputs.

Hypothesis generates adversarial timestamp collections (duplicated left
timestamps, empty sides, single-key pileups); pandas' merge_asof is the
independent reference implementation for backward-inclusive semantics.
"""

from __future__ import annotations

import pandas as pd

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_procedure_codes_crawler_spark.operators.asof import asof_join

_KEYS = st.sampled_from(["k1", "k2"])
# seconds offsets; right side deduped per (key, ts) so the match is unique
_TS = st.integers(min_value=0, max_value=50)


def _to_ts(seconds):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(seconds))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=12),
    right_rows=st.lists(st.tuples(_KEYS, _TS, st.integers(0, 99)), max_size=12),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left_pd = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [_to_ts(s) for _, s in left_rows],
            "lid": range(len(left_rows)),
        }
    )
    right_pd = (
        pd.DataFrame(
            {
                "k": [k for k, _, _ in right_rows],
                "ts": [_to_ts(s) for _, s, _ in right_rows],
                "v": [v for _, _, v in right_rows],
            }
        )
        .drop_duplicates(subset=["k", "ts"], keep="last")
        .reset_index(drop=True)
    )

    if len(right_pd):
        expected = pd.merge_asof(
            left_pd.sort_values(["ts", "lid"]),
            right_pd.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
        )
        expected_map = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in expected.itertuples()
        }
    else:  # empty right: merge_asof chokes on dtype-less frames
        expected_map = {int(lid): None for lid in left_pd["lid"]}

    left = spark.createDataFrame(left_pd, "k string, ts timestamp, lid long")
    right = (
        spark.createDataFrame(right_pd, "k string, ts timestamp, v long")
        if len(right_pd)
        else spark.createDataFrame([], "k string, ts timestamp, v long")
    )
    out = asof_join(left, right, on="k", prefix="r_")
    got = {
        int(r.lid): (None if r.r_v is None else int(r.r_v))
        for r in out.collect()
    }
    assert got == expected_map
