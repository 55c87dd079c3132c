"""The relational query corpus: every declared operator family from
SURVEY §2, exercised as (PySpark DataFrame plan, ANSI-SQL oracle) pairs
over the driver testdata tables (TESTDATA.md / FIXTURES.md §B).

The reference outsourced ALL of this surface to Athena (SURVEY §3 entry
point 3); in this engine Catalyst executes it. Each query is the Spark
plan a user would write; the oracle string is what DuckDB runs on the
same parquet for the driver's hash-compare.

Cross-engine determinism rules used throughout (they are the difference
between "usually matches" and "always matches"):

- money math is done in DECIMAL (exact), then CAST to DOUBLE at the end
  — summing doubles directly gives engine-dependent last-ulp results
  that flip rounded values at boundaries;
- averages are expressed as exact-sum / count in DOUBLE;
- every computed column is aliased identically in plan and oracle;
- int-ish outputs are cast to BIGINT (Spark's size()/row_number()
  return INT, DuckDB's len()/row_number() return BIGINT);
- top-k queries carry a total tie-break key so LIMIT is deterministic;
- timestamps are emitted as formatted strings (session tz is UTC).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: exact money type for intermediate aggregation
DEC = "decimal(18,2)"


def register(name: str, oracle: str | None = None):
    def decorator(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return decorator


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark rejects
        # unless read as long (runtime-settable SQL conf — the driver's
        # session won't have it preset).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long (see session.py) → microsecond timestamp, the
        # same truncation DuckDB applies when reading TIMESTAMP_NS.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _dec(col: str):
    return F.col(col).cast(DEC)


def _disc_price():
    """exact (extendedprice * (1 - discount)) in DECIMAL."""
    return _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Aggregation (SURVEY §2.5) — TPC-H Q1 shape
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_SQL_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide partial-aggregatable scan agg: map-side combine does most of
    the work; shuffle carries 6 groups × partial states, not rows."""
    lineitem = load(spark, sf_dir, "lineitem")
    count = F.count(F.lit(1))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_disc_price() * (F.lit(1).cast(DEC) + _dec("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / count).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / count).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / count).alias("avg_disc"),
            count.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-join + agg + deterministic top-k — TPC-H Q3 shape
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority AS orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is the small side → broadcast; orders⋈lineitem shuffles
    on orderkey once and the groupBy reuses that partitioning."""
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Six-way join — TPC-H Q5 shape
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region/nation/supplier/customer are all dimension-sized →
    broadcast chain; only orders⋈lineitem is a shuffle join."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Join + agg + top-k with tie-break — TPC-H Q10 shape
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Anti / semi joins (SURVEY §2.4 J1/J2 semantics on testdata)
# ---------------------------------------------------------------------------

@register(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J1/J2 left-anti shape: fact side keeps rows whose key is
    absent from the (distinct-projected, broadcast) key set."""
    customer = load(spark, sf_dir, "customer")
    order_keys = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return customer.join(
        F.broadcast(order_keys),
        customer.c_custkey == order_keys.o_custkey,
        "left_anti",
    ).select("c_custkey", "c_name")


@register(
    "semi_join_active_customers_by_nation",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n_name
    """,
)
def semi_join_active_customers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    order_keys = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        customer.join(
            F.broadcast(order_keys),
            customer.c_custkey == order_keys.o_custkey,
            "left_semi",
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# Cleaning P1-P3 (reference: procedure_code.py:721-723) on testdata
# ---------------------------------------------------------------------------

@register(
    "clean_codes_normalize",
    oracle="""
    WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN '  '
                    WHEN doc_id % 11 = 0 THEN 'FALSE '
                    WHEN doc_id % 7 = 0 THEN ''
                    ELSE source END AS code
        FROM documents
    ),
    cleaned AS (
        SELECT doc_id,
               CASE WHEN TRIM(code) = '' THEN NULL
                    WHEN LOWER(TRIM(code)) = 'false' THEN NULL
                    ELSE code END AS code
        FROM dirty
    )
    SELECT doc_id, code FROM cleaned WHERE code IS NOT NULL
    """,
)
def clean_codes_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 (reference: procedure_code.py:721-723) over
    deterministically-dirtied real data: blank→NULL, 'false'→NULL,
    drop nulls — through the pipeline's actual cleaning operator."""
    from ..operators.cleaning import clean_key_column

    documents = load(spark, sf_dir, "documents")
    dirty = documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, F.lit("  "))
        .when(F.col("doc_id") % 11 == 0, F.lit("FALSE "))
        .when(F.col("doc_id") % 7 == 0, F.lit(""))
        .otherwise(F.col("source"))
        .alias("code"),
    )
    return clean_key_column(dirty, "code")


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5)
# ---------------------------------------------------------------------------

@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(DATE_DIFF('day', prev_date, o_orderdate) AS BIGINT) AS gap_days
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_date
        FROM orders
    ) WHERE prev_date IS NOT NULL
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
        )
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date"))
            .cast("bigint")
            .alias("gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup (SURVEY §2.5 grouping sets)
# ---------------------------------------------------------------------------

@register(
    "rollup_revenue_by_flag_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Explode / lateral (SURVEY §2.7 fan-out shape) + set ops
# ---------------------------------------------------------------------------

@register(
    "explode_token_counts",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode fan-out the crawl pipeline uses for modifiers/NDC,
    on public data: one row in, many out, then re-aggregate."""
    documents = load(spark, sf_dir, "documents")
    return (
        documents.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "intersect_nations_with_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.intersect(supplier)


@register(
    "except_nations_customers_only",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_nations_customers_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract() = EXCEPT DISTINCT (set semantics): a key present on the
    # supplier side is removed entirely, regardless of multiplicity.
    return customer.subtract(supplier)


# ---------------------------------------------------------------------------
# JSON + timestamps over events (SURVEY §1.2 JSON row; F22/F23)
# ---------------------------------------------------------------------------

@register(
    "events_json_extract_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23 JSON parsing as a typed column op (from_json), not string
    hacks — schema'd structs stay in Tungsten rows."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.from_json("props", "k BIGINT").getField("k").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_hourly_windows",
    oracle="""
    SELECT STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch shape of the Structured
    Streaming query in streaming/events.py (same window fn)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "monthly_order_revenue",
    oracle="""
    SELECT STRFTIME(o_orderdate, '%Y-%m') AS order_month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def monthly_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Existence subquery — TPC-H Q4 shape
# ---------------------------------------------------------------------------

@register(
    "order_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    late = (
        lineitem.join(
            orders,
            (lineitem.l_orderkey == orders.o_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
