"""Tests for the skew-safe grouped top-k (operators/topk.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.operators.topk import grouped_topk


def _window_topk(df, keys, order_col, tiebreak_col, k):
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.asc(tiebreak_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(*keys, tiebreak_col, order_col, "rn")
    )


class TestGroupedTopk:
    def test_agrees_with_window_form(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        )
        ours = grouped_topk(
            orders, ["o_custkey"], "o_totalprice", "o_orderkey", k=3
        )
        ref = _window_topk(
            orders, ["o_custkey"], "o_totalprice", "o_orderkey", k=3
        )
        a = sorted(map(tuple, ours.collect()))
        b = sorted(map(tuple, ref.collect()))
        assert a == b

    def test_ties_break_ascending_on_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 5.0), (1, 13, 9.0)],
            "k bigint, id bigint, v double",
        )
        got = {
            (r.id, r.rn)
            for r in grouped_topk(df, ["k"], "v", "id", k=3).collect()
        }
        # 13 wins on value; then equal values rank by id ascending
        assert got == {(13, 1), (10, 2), (11, 3)}

    def test_fewer_rows_than_k(self, spark):
        df = spark.createDataFrame([(1, 1, 2.0)], "k bigint, id bigint, v double")
        rows = grouped_topk(df, ["k"], "v", "id", k=5).collect()
        assert [(r.id, r.rn) for r in rows] == [(1, 1)]

    def test_hot_key_skew(self, spark):
        """One key carrying 50k rows: the two-phase form must return
        exactly the same top-3 as the window form (the salt spreads the
        hot key; correctness must not depend on salt placement)."""
        hot = spark.range(50_000).select(
            F.lit(7).alias("k"),
            F.col("id").alias("id"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        got = sorted(
            (r.id, r.rn)
            for r in grouped_topk(hot, ["k"], "v", "id", k=3).collect()
        )
        # v=999 at ids 999, 1999, 2999, ...; top-3 = smallest such ids
        assert got == [(999, 1), (1999, 2), (2999, 3)]

    def test_full_input_window_is_salted(self, spark, sf_dir):
        """Plan shape: the window pass that sees the full input must be
        partitioned by (key, salt) — never by the key alone, which is
        what concentrates a hot key in one task."""
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        )
        plan = (
            grouped_topk(orders, ["o_custkey"], "o_totalprice", "o_orderkey", 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the first (full-input) exchange must carry the salt column
        first_exchange = [
            line for line in plan.splitlines() if "hashpartitioning" in line
        ][-1]  # plan prints top-down; the deepest exchange is phase 1
        assert "_salt" in first_exchange, first_exchange
        # no unspillable object-aggregation buffers anywhere
        assert "ObjectHashAggregate" not in plan
