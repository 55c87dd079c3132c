"""Session-gap boundary semantics: Spark's session_window MERGES an
event at exactly gap distance; both session oracles must break on
diff > gap (not >=) to agree at the boundary."""

from __future__ import annotations

import datetime

import duckdb

from pyspark.sql import functions as F


def test_session_window_merges_at_exact_gap(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=30)),  # exactly the gap
        (2, base),
        (2, base + datetime.timedelta(minutes=30, seconds=1)),  # past it
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_user: dict[int, list[int]] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n)
    assert sorted(per_user[1]) == [2]  # merged into ONE session
    assert sorted(per_user[2]) == [1, 1]  # split

    # the gaps-and-islands SQL with `> gap` break agrees exactly
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00'),"
        "(1, TIMESTAMP '2024-01-01 00:30:00'),"
        "(2, TIMESTAMP '2024-01-01 00:00:00'),"
        "(2, TIMESTAMP '2024-01-01 00:30:01')"
        ") t(user_id, ts)"
    )
    sql = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (SELECT user_id,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, COUNT(*) AS n FROM s GROUP BY user_id, sid
    """
    got = sorted(con.execute(sql).fetchall())
    assert got == [(1, 2), (2, 1), (2, 1)]
