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

from ..functions.timestamps import (
    epoch_micros,
    normalize_event_ts,
    parquet_ts_unit,
)

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


def _pin_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only when it differs. A read is a cheap
    side-effect-free py4j call; a SET invalidates cached plan state,
    so the steady-state path (sessions built by session.get_spark,
    which pins these values at creation) must not re-set per query —
    while a foreign or mutated session still gets corrected."""
    if spark.conf.get(key, None) != value:
        spark.conf.set(key, value)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The driver's gate runs these queries in ITS session, not ours:
    # pin the (runtime-settable) confs results depend on. Timezone —
    # NTZ→TIMESTAMP casts, epoch extraction, and window boundaries
    # must agree with the DuckDB oracle's naive-timestamp reading on
    # any host. ANSI — cast/overflow/try_cast semantics at the Spark 4
    # default the corpus is validated under. NOTE this is a deliberate
    # session-global side effect for sessions that arrive mis-pinned:
    # "running any corpus query opts that session into UTC+ANSI
    # semantics" — the documented contract of this query surface. For
    # sessions built by session.get_spark the check is read-only and
    # nothing is re-set (tests/test_conf_pinning.py).
    _pin_conf(spark, "spark.sql.session.timeZone", "UTC")
    _pin_conf(spark, "spark.sql.ansi.enabled", "true")
    if table == "events":
        # Tolerate a legacy TIMESTAMP(NANOS) encoding (read as long,
        # runtime-settable conf — the driver's session won't have it
        # preset); the actual dtype is inspected below, never assumed.
        _pin_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{table}.parquet")
    df = spark.read.parquet(path)
    if table == "events":
        # footer logical type (one driver-side read) makes the bigint
        # unit definitive; magnitude inference only covers plain INT64
        df = normalize_event_ts(df, bigint_unit=parquet_ts_unit(path))
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
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
    )
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J1/J2 left-anti shape: fact side keeps rows whose key is
    absent from the (distinct-projected, broadcast) key set. The date
    restriction keeps the result non-empty at every testdata scale
    (every customer has *some* order; lapsed-since-1999 customers
    exist), so the test can't pass vacuously on empty output."""
    customer = load(spark, sf_dir, "customer")
    order_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
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
    "grouped_topk_orders_per_customer",
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
def grouped_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same top-3 as window_top3_orders_per_customer, computed by
    the skew-safe two-phase salted aggregation (operators/topk.py)
    instead of a full-data window — after phase 1 only
    keys × salts × 3 rows shuffle, vs the window form moving every
    order row. Same oracle pins exact agreement of both plans."""
    from ..operators.topk import grouped_topk

    orders = load(spark, sf_dir, "orders")
    return grouped_topk(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        keys=["o_custkey"],
        order_col="o_totalprice",
        tiebreak_col="o_orderkey",
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


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


@register(
    "window_function_breadth",
    oracle="""
    SELECT o_orderkey,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           LEAD(o_orderkey) OVER w AS next_key,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cdist
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the window surface in one relation: dense_rank,
    ntile, lead, first_value, cume_dist over a deterministic total
    order (price desc, key asc breaks all ties)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.cume_dist().over(w).cast("double").alias("cdist"),
    )


@register(
    "full_outer_customer_supplier_nations",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def full_outer_customer_supplier_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full outer join of two aggregates — both null sides must
    survive and COALESCE to zero-counts."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_key"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_key"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.c_key == s.s_key, "full_outer").select(
        F.coalesce("c_key", "s_key").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "cross_join_region_priority_grid",
    oracle="""
    SELECT r_name, o_orderpriority
    FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    """,
)
def cross_join_region_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian of two small dims (the dimension-grid /
    date-spine pattern). Only ever sane when at least one side is
    broadcast-tiny — which is exactly how it plans here."""
    region = load(spark, sf_dir, "region").select("r_name")
    priorities = load(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return region.crossJoin(F.broadcast(priorities))


@register(
    "levenshtein_similar_sources",
    oracle="""
    WITH s AS (SELECT DISTINCT source FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(levenshtein(a.source, b.source) AS BIGINT) AS edit_dist
    FROM s a JOIN s b ON a.source < b.source
    WHERE levenshtein(a.source, b.source) <= 2
    """,
)
def levenshtein_similar_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance pairing over a small distinct domain (fuzzy
    source-name reconciliation). At scale the distinct() shrinks the
    pair space before the quadratic comparison — never levenshtein a
    raw fact table against itself."""
    s = load(spark, sf_dir, "documents").select("source").distinct()
    a = s.select(F.col("source").alias("source_a"))
    b = s.select(F.col("source").alias("source_b"))
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.levenshtein("source_a", "source_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
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


@register(
    "cube_order_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one pass (Spark
    expands to a single shuffle with grouping-id, same as rollup)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "pivot_event_counts_by_type",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'error')    AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'view')     AS "view"
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — at scale, never let pivot
    run its implicit distinct-values job over 100 TB; declare the
    domain and it's a single map-side conditional aggregation."""
    events = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


@register(
    "distinct_users_per_event_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def distinct_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark plans it as a two-phase expand +
    partial distinct, no driver involvement. (The approximate HLL
    variant is `approx_distinct_users` — rows-only, sketches differ
    across engines by design.)"""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_distinct_users")  # rows-only: HLL sketches are engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path where an
    exact distinct's expand-shuffle is too expensive; rsd=1%."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register("hll_sketch_union_users")  # rows-only: sketch bytes are engine-specific
def hll_sketch_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketches — the property that matters at 100 TB:
    per-group HLL sketches (datasketches, `hll_sketch_agg`) built in
    one pass are re-aggregated with `hll_union_agg` WITHOUT touching
    the raw data again. The per-type estimates and the unioned global
    estimate come out of one scan; an exact global distinct would need
    a second full shuffle. Accuracy vs exact is pinned in
    tests/test_sketches.py."""
    events = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    per_type_counts = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
    global_count = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users")
    ).select(F.lit("_all_").alias("event_type"), "approx_users")
    return per_type_counts.unionByName(global_count)


@register("heavy_hitter_tokens")  # rows-only: top-k sketch estimates are engine-specific
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the MERGEABLE approx_top_k sketch family:
    `approx_top_k_accumulate` builds per-group sketches in one pass,
    `approx_top_k_combine` merges them WITHOUT rescanning, and
    `approx_top_k_estimate` reads out the global top-10 tokens — the
    shape a 1000-executor frequency job takes (per-shard sketches up,
    one combine down), vs an exact wordcount's full token shuffle.
    Exact counterpart in the gate: vocab_top_terms; accuracy (the
    estimated top-10 ⊆ exact top-30 and counts within 5%) is pinned
    in tests/test_sketches.py."""
    documents = load(spark, sf_dir, "documents")
    tok = documents.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    per_source = tok.groupBy("source").agg(
        F.expr("approx_top_k_accumulate(token, 30)").alias("sk")
    )
    merged = per_source.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sk, 30), 10)").alias(
            "top"
        )
    )
    return merged.select(F.explode("top").alias("t")).select(
        F.col("t.item").alias("token"),
        F.col("t.count").cast("bigint").alias("approx_count"),
    )


@register("approx_quantiles_prices")  # rows-only: quantile sketches differ per engine
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketching (Greenwald-Khanna `percentile_approx`, 1%
    accuracy): the scale path when an exact median's full sort is too
    expensive. Exact counterpart in the gate: median_quantity_by_flag.
    Accuracy vs exact percentiles is pinned in tests/test_sketches.py."""
    li = load(spark, sf_dir, "lineitem")
    q = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
    )
    return li.groupBy("l_returnflag").agg(
        q[0].alias("p50"), q[1].alias("p90"), q[2].alias("p99")
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
    "explode_token_counts_salted",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
)
def explode_token_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same relation as ``explode_token_counts`` but through the salted
    two-phase aggregate (operators/skew.py) — token frequencies are the
    canonical Zipf-skewed key distribution, where at 100 TB the hot
    tokens would pin single reducers without salting. Oracle identical
    to the unsalted query: salting must be invisible in the result."""
    from ..operators.skew import salted_agg

    documents = load(spark, sf_dir, "documents")
    tokens = documents.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    return salted_agg(tokens, ["token"], {"n": ("count", "token")}, buckets=8)


@register(
    "window_trailing_90d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
               RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_90d
    FROM orders
    """,
)
def window_trailing_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): trailing 90-day spend
    per customer. Spark's rangeBetween needs a numeric ordering key, so
    the date is ordered as unix_date (days since epoch) with the frame
    expressed in days — the same frame DuckDB's INTERVAL 90 DAY RANGE
    clause defines on a DATE ordering. Frames by value are tie-stable
    (equal dates share a frame), so no tie-break column is needed."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-90, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_90d"),
    )


@register(
    "date_functions_breadth",
    oracle="""
    SELECT STRFTIME(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           STRFTIME(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           STRFTIME(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def date_functions_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface: trunc, last_day, day-of-week
    (normalized — Spark is 1-based Sunday, DuckDB 0-based), month
    arithmetic. The shapes every date-partitioned warehouse query
    leans on."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
            F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias(
                "plus3m"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "grouping_id_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS orderstatus,
           COALESCE(o_orderpriority, '(all)') AS orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguish 'NULL because subtotal row' from
    'NULL in the data' — the correct way to consume rollup output
    (COALESCE alone conflates the two)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("orderpriority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


@register(
    "string_agg_sources_by_lang",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def string_agg_sources_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_set is unordered (and
    collect_list nondeterministic across retries), so the deterministic
    form is sort_array(collect_set(...)) then join — pinned against
    string_agg(DISTINCT ... ORDER BY)."""
    documents = load(spark, sf_dir, "documents")
    return documents.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.count_distinct("source").alias("n_sources"),
    )


@register(
    "bool_aggregates_by_event_type",
    oracle="""
    SELECT event_type,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 99) AS any_large,
           COUNT(*) FILTER (value > 99) AS n_large
    FROM events
    GROUP BY event_type
    """,
)
def bool_aggregates_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) — the assertion-style rollups a
    data-quality gate runs per partition before publishing."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_large"),
        F.count(F.when(F.col("value") > 99, 1)).alias("n_large"),
    )


@register(
    "try_cast_safe_parsing",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(TRY_CAST(SUBSTR(source, 4) AS BIGINT)) AS n_numeric_suffix,
           CAST(SUM(COALESCE(TRY_CAST(SUBSTR(source, 4) AS BIGINT), 0))
                AS BIGINT) AS suffix_sum,
           COUNT(TRY_CAST(source AS BIGINT)) AS n_fully_numeric
    FROM documents
    """,
)
def try_cast_safe_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast semantics: malformed values become NULL instead of
    failing the job — the difference between one bad record and a dead
    100 TB pipeline (ANSI mode makes plain CAST throw)."""
    documents = load(spark, sf_dir, "documents")
    suffix = F.expr("try_cast(substring(source, 4) AS BIGINT)")
    return documents.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(suffix).alias("n_numeric_suffix"),
        F.sum(F.coalesce(suffix, F.lit(0))).cast("bigint").alias("suffix_sum"),
        F.count(F.expr("try_cast(source AS BIGINT)")).alias("n_fully_numeric"),
    )


@register(
    "median_quantity_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (percentile 0.5) — both engines use
    the same linear-interpolation convention and quantities are small
    integers, so the midpoint arithmetic is bit-exact. Higher
    percentiles (0.9 etc.) can differ in the interpolation fraction's
    last ulp and are left to approx sketches at scale."""
    lineitem = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "union_by_name_mixed_sources",
    oracle="""
    SELECT kind, COUNT(*) AS n,
           COUNT(balance) AS n_with_balance
    FROM (
        SELECT c_name AS name, c_acctbal AS balance, 'customer' AS kind
        FROM customer
        UNION ALL BY NAME
        SELECT 'supplier' AS kind, s_name AS name
        FROM supplier
    )
    GROUP BY kind
    """,
)
def union_by_name_mixed_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union with missing-column NULL backfill
    (unionByName allowMissingColumns) — the schema-evolution-tolerant
    union an accreting 100 TB dataset needs; positional UNION would
    silently misalign."""
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_name").alias("name")
    )
    return (
        customer.unionByName(supplier, allowMissingColumns=True)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("balance").alias("n_with_balance"),
        )
    )


@register(
    "posexplode_token_positions",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    u AS (SELECT doc_id,
                 UNNEST([{'pos': i, 'token': toks[i]}
                         for i in generate_series(1, len(toks))]) AS s
          FROM t)
    SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.token AS token
    FROM u WHERE s.pos <= 3
    """,
)
def posexplode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal fan-out (posexplode) — position-aware explode; Spark's
    0-based pos normalized to the oracle's 1-based ordinality."""
    documents = load(spark, sf_dir, "documents")
    return (
        documents.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "token"),
        )
        .select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "token")
        .filter(F.col("pos") <= 3)
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


@register(
    "cohort_monthly_retention",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    first_seen AS (
        SELECT user_id, STRFTIME(MIN(ts), '%Y-%m') AS cohort FROM e GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, STRFTIME(ts, '%Y-%m') AS act_month FROM e
    )
    SELECT cohort, act_month, COUNT(*) AS n_active_users
    FROM first_seen JOIN activity USING (user_id)
    GROUP BY cohort, act_month
    """,
)
def cohort_monthly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users keyed by first-seen month, counted
    in every month they were active — two aggregations over one events
    scan; the cohort side is per-user (small) and broadcasts back."""
    events = load(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM").alias("cohort")
    )
    activity = events.select(
        "user_id", F.date_format("ts", "yyyy-MM").alias("act_month")
    ).distinct()
    return (
        activity.join(F.broadcast(first_seen), "user_id")
        .groupBy("cohort", "act_month")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "deterministic_sample_documents",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
          % 10 = 0
    """,
)
def deterministic_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample that is a pure function of the key — unlike
    rand()-based sample(), identical across runs, engines, partitions,
    and retries, and it composes with incremental processing (a doc's
    membership never flips). md5 because both engines share it."""
    documents = load(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return documents.filter(bucket % 10 == 0).select("doc_id", "lang")


@register(
    "null_semantics_showcase",
    oracle="""
    WITH t AS (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'BUILDING') AS seg_nb,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg_pos
        FROM customer
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(seg_nb) AS n_seg_nb,
           COUNT(*) FILTER (seg_nb IS NOT DISTINCT FROM seg_pos) AS n_nullsafe_eq,
           COUNT(*) FILTER (seg_nb IS NULL AND seg_pos IS NULL) AS n_both_null,
           COALESCE(MIN(seg_nb), 'none') AS min_seg
    FROM t
    """,
)
def null_semantics_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL NULL edge semantics in one relation: NULLIF sentinels (the
    P1/P2 cleaning primitive), COUNT(col) vs COUNT(*), null-safe
    equality (<=> / IS NOT DISTINCT FROM — the comparison dedup keys
    need when keys can be NULL), COALESCE defaults."""
    customer = load(spark, sf_dir, "customer")
    t = customer.select(
        "c_custkey",
        F.expr("NULLIF(c_mktsegment, 'BUILDING')").alias("seg_nb"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_pos"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg_nb").alias("n_seg_nb"),
        F.count(F.when(F.expr("seg_nb <=> seg_pos"), 1)).alias("n_nullsafe_eq"),
        F.count(
            F.when(F.col("seg_nb").isNull() & F.col("seg_pos").isNull(), 1)
        ).alias("n_both_null"),
        F.coalesce(F.min("seg_nb"), F.lit("none")).alias("min_seg"),
    )


@register(
    "sessionize_user_events",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM marked
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via ``session_window`` (30-minute gap) —
    the same declarative operator the streaming module uses, checked
    against the classic gaps-and-islands SQL (lag + running flag sum).
    Boundary semantics verified empirically: Spark MERGES an event at
    exactly gap distance (diff <= gap joins the session), so the SQL
    breaks on diff > gap — pinned in tests/test_session_boundary.py.
    One shuffle on user_id either way; session_window just says it in
    one operator instead of three windows."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("s"), "user_id"
        )
        .agg(
            F.min("ts").alias("min_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@register(
    "q9_product_revenue_by_nation_year",
    oracle=f"""
    SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part     ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q9_product_revenue_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (profit → revenue; the testdata has no partsupp/
    supplycost): substring part filter, supplier-nation attribution,
    per-year rollup."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame (running total) — exact DECIMAL inside
    the frame so every prefix sum is cross-engine identical, not just
    the final one."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "array_functions_showcase",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           array_to_string(list_sort(toks)[1:3], '|') AS first3_sorted,
           CAST(len(list_filter(toks, x -> len(x) > 3)) AS BIGINT) AS n_long,
           CAST(list_sum([CASE WHEN len(x) > 3 THEN 1 ELSE 0 END
                          for x in toks]) AS BIGINT) AS n_long_agg
    FROM t
    """,
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate/
    sort/slice/join) staying entirely JVM-side — the column-native
    toolkit the LLM operators build on, checked against DuckDB's list
    comprehensions."""
    documents = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    return documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), "|").alias("first3_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 3))
        .cast("bigint")
        .alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: (F.length(x) > 3).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_long_agg"),
    )


@register(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS "column", COUNT(*) AS n_rows,
           COUNT(*) FILTER (doc_id IS NULL) AS n_nulls,
           COUNT(DISTINCT doc_id) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*),
           COUNT(*) FILTER (lang IS NULL),
           COUNT(DISTINCT lang), MIN(lang), MAX(lang)
    FROM documents
    UNION ALL
    SELECT 'source', COUNT(*),
           COUNT(*) FILTER (source IS NULL),
           COUNT(DISTINCT source), MIN(source), MAX(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*),
           COUNT(*) FILTER (n_chars IS NULL),
           COUNT(DISTINCT n_chars),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-pass profiler (operators/profile.py) over four
    columns — one aggregation job however many columns are profiled."""
    from ..operators.profile import profile

    documents = load(spark, sf_dir, "documents")
    return profile(documents, ["doc_id", "lang", "source", "n_chars"])


@register(
    "scalar_extract_functions",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(lower(text), '\s+', ' ', 'g') AS norm_text,
           split_part(text, ' ', 1) AS first_word,
           regexp_extract(source, '([^:]*)$', 1) AS after_colon,
           translate(source, '.', '') AS source_nodots,
           CASE WHEN contains(lower(source), 'cpt') THEN 'CPT'
                ELSE 'HCPCS' END AS code_type,
           regexp_extract(text, '(\d{2,5}-\d{2,5})', 1) AS interval_like
    FROM documents
    """,
)
def scalar_extract_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6's ⊕ column-function mappings as one relation —
    the native-Spark equivalents of the reference's extraction string
    ops (F5 regexp intervals, F13 dot-strip translate, F16 after-colon
    substring_index, F20 whitespace normalize, F21 code-type
    classifier), all JVM-side, zero Python in the data path."""
    documents = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), r"\s+", " ").alias("norm_text"),
        F.substring_index("text", " ", 1).alias("first_word"),
        F.substring_index("source", ":", -1).alias("after_colon"),
        F.translate("source", ".", "").alias("source_nodots"),
        F.when(F.lower("source").contains("cpt"), "CPT")
        .otherwise("HCPCS")
        .alias("code_type"),
        F.regexp_extract("text", r"(\d{2,5}-\d{2,5})", 1).alias("interval_like"),
    )


#: monotonically unique memory-sink names (one session may run this
#: query repeatedly; memory sink names are session-global)
_STREAM_SEQ = [0]


@register(
    "streaming_hourly_event_counts",
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
def streaming_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING path through the correctness gate: drive the
    Structured Streaming tumbling-window aggregation (watermark +
    availableNow) over the same events data and hash-match it against
    the BATCH oracle — stream/batch parity as a checked invariant, not
    a claim. Uses a staged file-source directory (file streams read
    directories) and a memory sink."""
    from ..streaming.events import (
        hourly_event_counts,
        read_events_stream,
        run_to_memory,
    )

    staged = _stage_events(sf_dir)
    _STREAM_SEQ[0] += 1
    name = f"stream_hourly_{_STREAM_SEQ[0]}"
    try:
        stream = read_events_stream(spark, staged)
        query = run_to_memory(hourly_event_counts(stream), name)
        query.stop()
    finally:
        _cleanup_staged(staged)
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _stage_events(sf_dir: str) -> str:
    """Stage events.parquet into a fresh dir (file streams read
    directories). Callers remove it via :func:`_cleanup_staged` in a
    finally once the stream has drained — the gate may invoke a query
    repeatedly, and each leak would be a full events.parquet copy."""
    import shutil
    import tempfile

    staged = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(staged, "part-000.parquet"),
    )
    return staged


def _cleanup_staged(staged: str) -> None:
    import shutil

    shutil.rmtree(staged, ignore_errors=True)


@register(
    "streaming_sliding_value_averages",
    oracle="""
    WITH w AS (
        SELECT event_type, value,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL 30 MINUTE]) AS wstart
        FROM events
    )
    SELECT STRFTIME(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_value
    FROM w GROUP BY 1, 2
    """,
)
def streaming_sliding_value_averages(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OVERLAPPING (sliding) windows through the streaming engine,
    hash-matched against a batch oracle that materializes each event's
    two member windows explicitly (1-hour window, 30-minute slide ⇒
    every event belongs to exactly the two windows starting at
    floor_30(ts) and floor_30(ts)−30min — no boundary ambiguity, since
    window membership is [start, start+1h))."""
    from ..streaming.events import (
        read_events_stream,
        run_to_memory,
        sliding_value_averages,
    )

    staged = _stage_events(sf_dir)
    _STREAM_SEQ[0] += 1
    name = f"stream_sliding_{_STREAM_SEQ[0]}"
    try:
        query = run_to_memory(
            sliding_value_averages(read_events_stream(spark, staged)), name
        )
        query.stop()
    finally:
        _cleanup_staged(staged)
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "avg_value",
    )


@register(
    "streaming_session_windows",
    oracle="""
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         IS NULL
                     OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic session windows (30-minute gap) through the streaming
    engine vs the batch gaps-and-islands oracle. Boundary semantics:
    Spark merges an event at exactly gap distance (diff ≤ gap joins),
    so the SQL breaks on diff > gap — the two agree at EVERY diff,
    including the boundary (pinned empirically in
    tests/test_session_boundary.py). Second of the three streaming
    gate queries; state is
    watermark-bounded so the same plan runs on an unbounded stream."""
    from ..streaming.events import (
        read_events_stream,
        run_to_memory,
        user_session_windows,
    )

    staged = _stage_events(sf_dir)
    _STREAM_SEQ[0] += 1
    name = f"stream_session_{_STREAM_SEQ[0]}"
    try:
        query = run_to_memory(
            user_session_windows(read_events_stream(spark, staged)), name
        )
        query.stop()
    finally:
        _cleanup_staged(staged)
    return spark.table(name).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
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
    """EXISTS as a single left-semi with the non-equi condition riding on
    the equi key — the semi join dedups matches itself, so no distinct
    and no second pass over orders (one shuffle join, then agg)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped widening (adapted to the testdata's simplified schema:
# no partsupp, no commit/receipt dates, no shipmode — FIXTURES.md §B)
# ---------------------------------------------------------------------------

@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-agg: every predicate pushes to the parquet scan, the
    'plan' is one codegen stage with a 1-row global agg — the shape that
    must saturate IO at 100 TB."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & _dec("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
               {_SQL_DISC_PRICE} AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                      JOIN orders   ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation n1 ON s_nationkey = n1.n_nationkey
                      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the two nation dims broadcast; the disjunctive
    nation-pair predicate runs after the broadcast joins so the big
    fact join is still a single orderkey shuffle."""
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               {_SQL_DISC_PRICE} AS volume,
               n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region   ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's market for one part
    type. Numerator/denominator as exact DECIMAL sums, divided in
    DOUBLE at the end (division is where cross-engine drift lives)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    n_cust = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast(DEC)
    joined = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n_cust), customer.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == region.r_regionkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n_supp), supplier.s_nationkey == F.col("ns_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _disc_price()).otherwise(zero)
            )
            .cast("double")
            .alias("_num"),
            F.sum(_disc_price()).cast("double").alias("_den"),
        )
        .select(
            "o_year", (F.col("_num") / F.col("_den")).cast("double").alias("mkt_share")
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: outer join preserved through two aggregation levels —
    COUNT(col) (nulls excluded) is the semantic under test."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS DOUBLE) AS promo_revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    zero = F.lit(0).cast(DEC)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero))
            .cast("double")
            .alias("_promo"),
            F.sum(_disc_price()).cast("double").alias("_total"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (F.lit(100.0) * F.col("_promo") / F.col("_total"))
            .cast("double")
            .alias("promo_revenue"),
            "n_items",
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_SQL_DISC_PRICE}) AS total
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT MAX(total) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: argmax over an aggregate. The max-comparison happens in
    exact DECIMAL (double equality would be engine-dependent); the
    1-row max broadcasts back onto the revenue relation."""
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total")
    )
    max_rev = revenue.agg(F.max("total").alias("max_total"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total == F.col("max_total"))
        .join(F.broadcast(supplier), F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * (SUM(l_quantity) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated scalar AVG decorrelated into a per-part
    aggregate joined back — quantities are small integers so the
    double sum is exact and the 0.2× threshold is engine-stable."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    lineitem = load(spark, sf_dir, "lineitem")
    per_part_avg = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(per_part_avg, lineitem.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: IN-subquery over an aggregate → semi join against the
    (tiny) qualifying-keys relation, broadcast back onto the fact."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(
            F.broadcast(big_orders),
            orders.o_orderkey == big_orders.l_orderkey,
            "left_semi",
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunctive mixed-table predicates — the join stays a plain
    equi broadcast join and the OR-of-ANDs evaluates post-join (the
    per-table conjuncts Catalyst can factor out, it pushes down)."""
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH threshold AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                   AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, threshold
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY n_name
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (no phone column → nation name stands in for the
    country code): scalar-aggregate threshold broadcast as a 1-row
    cross join, anti join against lapsed-since-1999 orders (every
    customer has some order in this testdata, so the unrestricted
    anti join would be vacuously empty), then group."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    threshold = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(_dec("c_acctbal") > F.col("avg_bal"))
        .join(orders_keys, customer.c_custkey == orders_keys.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Range join (custom temporal operator, operators/rangejoin.py)
# ---------------------------------------------------------------------------

@register(
    "range_join_purchases_within_hour_of_signup",
    oracle="""
    WITH s AS (SELECT event_id AS signup_id, user_id,
                      CAST(ts AS TIMESTAMP) AS s_start,
                      CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS s_end
               FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase')
    SELECT s.signup_id, s.user_id, COUNT(*) AS n_purchases
    FROM s JOIN p ON s.user_id = p.user_id
                 AND p.ts >= s.s_start AND p.ts < s.s_end
    GROUP BY s.signup_id, s.user_id
    """,
)
def range_join_purchases_within_hour_of_signup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Funnel join: purchases inside [signup, signup+1h) per user —
    the bucketed range join (plain shuffled equi-join on
    (user, time-bucket)) vs DuckDB's non-equi join as oracle."""
    from ..operators.rangejoin import range_join

    events = load(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("s_end"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return (
        range_join(
            purchases,
            signups,
            point_ts="ts",
            interval_start="s_start",
            interval_end="s_end",
            on="user_id",
            bucket_seconds=3600,
        )
        .groupBy("signup_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


# ---------------------------------------------------------------------------
# As-of join (custom temporal operator, operators/asof.py)
# ---------------------------------------------------------------------------

@register(
    "asof_last_view_before_purchase",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           v.event_id AS view_event_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's latest not-later view —
    the union+window as-of join (one shuffle) vs DuckDB's native
    ASOF JOIN as the oracle."""
    from ..operators.asof import asof_join

    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, views, on="user_id", prefix="view_")
    return joined.select(
        "event_id",
        "user_id",
        "view_event_id",
        (epoch_micros("ts") - epoch_micros("view_ts"))
        .cast("bigint")
        .alias("gap_us"),
    )


@register(
    "date_spine_daily_revenue",
    oracle="""
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders),
    b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM o),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b
    ),
    daily AS (
        SELECT d, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
               COUNT(*) AS n
        FROM o GROUP BY d
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(rev, 0) AS DOUBLE) AS revenue,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
)
def date_spine_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: a generated day dimension left-joined to
    the daily aggregate so zero-order days appear explicitly (the
    standard fix for time series with holes). The spine derives from a
    1-row min/max aggregate via sequence+explode — no driver collect —
    and both join sides are post-aggregation tiny (one row per day)
    regardless of input scale, so the join cost is O(days), not O(rows)."""
    orders = load(spark, sf_dir, "orders").withColumn(
        "d", F.col("o_orderdate").cast("date")
    )
    spine = (
        orders.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    daily = orders.groupBy("d").agg(
        F.sum(_dec("o_totalprice")).alias("rev"), F.count(F.lit(1)).alias("n")
    )
    return spine.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("rev"), F.lit(0).cast(DEC)).cast("double").alias("revenue"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


@register(
    "exact_moment_statistics",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    ),
    d AS (
        SELECT *,
               sxx - sx * sx / n AS dx,
               syy - sy * sy / n AS dy,
               sxy - sx * sy / n AS dxy
        FROM s
    )
    SELECT l_returnflag,
           n AS n_rows,
           sx / n AS mean_qty,
           sqrt(dx / (n - 1)) AS stddev_qty,
           dxy / sqrt(dx * dy) AS corr_qty_price,
           dxy / dx AS slope_price_per_qty,
           sy / n - (dxy / dx) * (sx / n) AS intercept
    FROM d
    """,
)
def exact_moment_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev, correlation, OLS slope) that
    hash-match across engines. Built-in stddev/corr are order-dependent
    double accumulations — different partitionings give different last
    ulps. Here every SUM runs in exact DECIMAL (map-side partial aggs
    still apply), and the floating-point math happens only in the final
    per-group scalar expressions, with the identical IEEE operation tree
    on both engines. The decimal sums go to double THROUGH A STRING:
    once a sum's unscaled value exceeds 2^53 (the squared-price sum
    does), direct decimal→double conversion rounds differently per
    engine, while decimal→string is exact and string→double is
    correctly rounded in both. One shuffle on the group key; moment
    sums make this a single pass regardless of scale."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("string").cast("double").alias("sx"),
        F.sum(y).cast("string").cast("double").alias("sy"),
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
        F.sum(y * y).cast("string").cast("double").alias("syy"),
        F.sum(x * y).cast("string").cast("double").alias("sxy"),
    )
    d = s.withColumns(
        {
            "dx": F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
            "dy": F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"),
            "dxy": F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"),
        }
    )
    return d.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        (F.col("sx") / F.col("n")).alias("mean_qty"),
        F.sqrt(F.col("dx") / (F.col("n") - 1)).alias("stddev_qty"),
        (F.col("dxy") / F.sqrt(F.col("dx") * F.col("dy"))).alias("corr_qty_price"),
        (F.col("dxy") / F.col("dx")).alias("slope_price_per_qty"),
        (
            F.col("sy") / F.col("n")
            - (F.col("dxy") / F.col("dx")) * (F.col("sx") / F.col("n"))
        ).alias("intercept"),
    )


@register(
    "unpivot_monthly_status_revenue",
    oracle="""
    WITH wide AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'F'), 0) AS DOUBLE) AS rev_F,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'O'), 0) AS DOUBLE) AS rev_O,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (o_orderstatus = 'P'), 0) AS DOUBLE) AS rev_P
        FROM orders GROUP BY 1
    )
    SELECT month, split_part(status_col, '_', 2) AS status, revenue
    FROM (UNPIVOT wide ON rev_F, rev_O, rev_P
          INTO NAME status_col VALUE revenue)
    """,
)
def unpivot_monthly_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of pivot): conditional aggregation
    builds one revenue column per order status, then unpivot restores
    tidy (month, status, revenue) rows. NULL cells are coalesced to 0
    *before* the melt because SQL UNPIVOT drops NULL measures while the
    DataFrame unpivot keeps them — pre-coalescing makes both engines
    agree. Unpivot itself is a zero-shuffle projection."""
    orders = load(spark, sf_dir, "orders")

    def rev(status: str):
        return (
            F.coalesce(
                F.sum(F.when(F.col("o_orderstatus") == status, _dec("o_totalprice"))),
                F.lit(0).cast(DEC),
            )
            .cast("double")
            .alias(f"rev_{status}")
        )

    wide = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(rev("F"), rev("O"), rev("P"))
    return wide.unpivot(
        ["month"], ["rev_F", "rev_O", "rev_P"], "status_col", "revenue"
    ).select(
        "month",
        F.substring_index("status_col", "_", -1).alias("status"),
        "revenue",
    )


@register(
    "customer_spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, spend,
               NTILE(10) OVER (ORDER BY spend ASC, o_custkey ASC) AS decile
        FROM spend
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n_customers,
           CAST(SUM(spend) AS DOUBLE) AS total_spend,
           CAST(MIN(spend) AS DOUBLE) AS min_spend,
           CAST(MAX(spend) AS DOUBLE) AS max_spend
    FROM ranked GROUP BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning: customers ranked into spend deciles,
    then per-decile summary — SQL NTILE(10) semantics reproduced with a
    two-phase distributed rank instead of a single-partition window
    (per-customer cardinality at 100 TB is billions of rows; an
    unpartitioned NTILE sort funnels all of them through one task).

    Phase 1: bin rows by quantile-edge comparison — the edges come
    from ONE approx_percentile job, collected and folded into the plan
    as literals, so a row's bin is a pure function of its value and
    identical in every job that evaluates it (repartitionByRange is
    NOT usable here: its range bounds come from per-execution
    reservoir sampling, and this query's counts job and final job
    would re-execute the exchange with different bounds — rows near a
    bound would shift blocks between jobs and silently corrupt
    ranks). Binning by value respects the (spend, custkey) total
    order: lower spend → same-or-lower bin, ties share a bin.
    Phase 2: a per-bin row_number window gives local positions; the
    per-bin counts (metadata-sized) are collected, turned into
    cumulative offsets, and broadcast back as a literal map;
    global_rank = offset[bin] + local_pos. The decile is then exact
    NTILE arithmetic: with n rows, the first n%10 buckets take
    ceil(n/10) rows, the rest floor(n/10).
    """
    orders = load(spark, sf_dir, "orders")
    # materialize the per-customer aggregate ONCE: three downstream
    # jobs consume it (quantile edges, per-bin counts, final ranks) —
    # without the checkpoint each would re-scan and re-aggregate the
    # orders fact (3× the heavy work at 100 TB); the checkpointed
    # relation is per-customer, orders-of-magnitude smaller
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("spend")
    ).localCheckpoint(eager=True)
    num_bins = max(spark.sparkContext.defaultParallelism, 16)
    fracs = [i / num_bins for i in range(1, num_bins)]
    edge_row = spend.select(
        F.percentile_approx(
            F.col("spend").cast("double"), F.array(*[F.lit(f) for f in fracs]),
            F.lit(10_000),
        ).alias("edges")
    ).first()
    edges = sorted(set(edge_row["edges"] or []))
    spend_d = F.col("spend").cast("double")
    bin_col = F.lit(0)
    for e in edges:
        bin_col = bin_col + (spend_d > F.lit(e)).cast("int")
    w_bin = Window.partitionBy("_bin").orderBy(
        F.col("spend").asc(), F.col("o_custkey").asc()
    )
    ranked = spend.withColumn("_bin", bin_col).withColumn(
        "_pos", F.row_number().over(w_bin)
    )
    # metadata-sized: one row per bin; deterministic because _bin is a
    # literal-edge comparison, not a sampled partitioner
    counts = sorted(
        (r["_bin"], r["cnt"])
        for r in ranked.groupBy("_bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    n = sum(c for _, c in counts)
    offsets, acc = {}, 0
    for b, c in counts:
        offsets[b] = acc
        acc += c
    base, rem = divmod(n, 10)
    cut = rem * (base + 1)  # rows in the first `rem` (larger) buckets
    # offsets cast to BIGINT before the addition: past 2^31 customers
    # an int32 offset + int32 row_number wraps (non-ANSI) or throws
    # (ANSI) before any outer cast could help
    offset_map = F.create_map(
        *[
            x
            for b, off in offsets.items()
            for x in (F.lit(b), F.lit(off).cast("bigint"))
        ]
    )
    rank = F.element_at(offset_map, F.col("_bin")) + F.col("_pos").cast("bigint")
    decile = F.when(
        rank <= F.lit(cut),
        F.floor((rank - 1) / F.lit(base + 1)) + 1,
    ).otherwise(
        # max(base,1) guards the n<10 degenerate case where this branch
        # is never taken but ANSI mode would still reject a /0 literal
        F.lit(rem) + F.floor((rank - F.lit(cut) - 1) / F.lit(max(base, 1))) + 1
    )
    return ranked.withColumn("decile", decile).groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend").cast("double").alias("total_spend"),
        F.min("spend").cast("double").alias("min_spend"),
        F.max("spend").cast("double").alias("max_spend"),
    ).select(F.col("decile").cast("bigint").alias("decile"), "n_customers",
             "total_spend", "min_spend", "max_spend")


@register(
    "funnel_signup_to_purchase",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > t1 GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > t2 GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t4
        FROM events e JOIN s3 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > t3 GROUP BY e.user_id
    )
    SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT '2_view', COUNT(*) FROM s2
    UNION ALL SELECT '3_click', COUNT(*) FROM s3
    UNION ALL SELECT '4_purchase', COUNT(*) FROM s4
    """,
)
def funnel_signup_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users counted at each stage only if
    the stage event happened strictly AFTER their previous stage's
    first event (the sequential semantics that distinguish a funnel
    from four independent counts).

    SINGLE-SCAN formulation: one groupBy(user_id) collects each
    stage's timestamps (conditional collect_list — NULLs from other
    event types are skipped by Spark's list aggregation), then the
    stage chain t2/t3/t4 is pure JVM array algebra:
    ``array_min(filter(stage_ts, t -> t > prev_t))`` — exactly "first
    stage event strictly after the previous stage's first". A NULL
    prev_t nulls the comparison, so non-survivors propagate NULL down
    the chain for free. One fact scan + one user_id shuffle, vs the
    naive per-stage groupBy+join chain whose recursive re-evaluation
    cost 10 scans and 17 exchanges (A/B at sf0.1: 1.12s → 0.66s warm,
    identical output).

    Skew note for 100 TB: per-user state is that user's event
    timestamps (~8B each); a pathological user with 10^6 events costs
    ~8 MB in one aggregation buffer — the same class of bounded-state
    assumption as sessionization, and far cheaper than the 10-scan
    alternative."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("vs"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("cs"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("ps"),
    )
    chained = (
        per_user.withColumn(
            "t2", F.array_min(F.filter("vs", lambda v: v > F.col("t1")))
        )
        .withColumn(
            "t3", F.array_min(F.filter("cs", lambda c: c > F.col("t2")))
        )
        .withColumn(
            "t4", F.array_min(F.filter("ps", lambda p: p > F.col("t3")))
        )
    )
    agg = chained.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.count("t4").alias("n4"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_signup").alias("stage"), F.col("n1").alias("n_users")
                ),
                F.struct(
                    F.lit("2_view").alias("stage"), F.col("n2").alias("n_users")
                ),
                F.struct(
                    F.lit("3_click").alias("stage"), F.col("n3").alias("n_users")
                ),
                F.struct(
                    F.lit("4_purchase").alias("stage"),
                    F.col("n4").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


# ---------------------------------------------------------------------------
# TPC-H completion: the remaining query shapes (Q2/Q11/Q12/Q16/Q20/Q21),
# adapted to the testdata's simplified schema (no partsupp/commitdate/
# shipmode — FIXTURES.md §B). With these, all 22 TPC-H query SHAPES have
# a counterpart: correlated-min subquery, scalar-subquery threshold,
# conditional aggregation, NOT-IN + distinct-count, semi-join on an
# aggregate predicate, and the multi-party "last to act" pattern.
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT ps.l_partkey, ps.l_suppkey, ps.cost,
               s_acctbal, s_name, n_name
        FROM ps
          JOIN supplier ON s_suppkey = ps.l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
          JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    best AS (
        SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost
        FROM eu
    )
    SELECT s_acctbal, s_name, n_name,
           p_partkey, p_name,
           CAST(cost AS DOUBLE) AS supply_cost
    FROM best
      JOIN part ON p_partkey = l_partkey
    WHERE cost = min_cost
      AND p_size = 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — correlated MIN subquery ("the supplier offering this
    part cheapest in Europe"), with min unit cost per (part, supplier)
    standing in for the missing partsupp.ps_supplycost. The correlated
    subquery is a window MIN over partkey on the already-filtered
    relation — one shuffle, no re-scan, and the equality check runs in
    exact DECIMAL. Region/nation/part dims broadcast.

    The selective part predicate is applied BELOW the fact
    aggregation (broadcast inner join commutes with the per-(part,
    supplier) MIN and the per-part window): only ~2% of lineitem rows
    survive to the groupBy, so the one fact shuffle carries 50× fewer
    bytes — the difference between a plan that works and one that's
    scan-bound at 100 TB. A/B at sf0.1: 1.24s → 0.70s warm."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    li_p = li.join(
        F.broadcast(part.select("p_partkey", "p_name")),
        li.l_partkey == F.col("p_partkey"),
    )
    ps = li_p.groupBy("l_partkey", "l_suppkey", "p_partkey", "p_name").agg(
        F.min(_dec("l_extendedprice")).alias("cost")
    )
    eu = (
        ps.join(F.broadcast(supplier), ps.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_part_value",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))) AS value
        FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT SUM(value) AS grand FROM val)
    SELECT l_partkey AS partkey, CAST(value AS DOUBLE) AS part_value
    FROM val, total
    WHERE value > grand * CAST(0.005 AS DECIMAL(6,4))
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — scalar-subquery threshold ("parts worth more than a
    fraction of total inventory value"). The 1-row grand total joins
    back on a constant key, so the plan is a BroadcastHashJoin (not a
    nested-loop product) and the > comparison runs in exact DECIMAL on
    both engines."""
    li = load(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("value")
    )
    total = val.agg(F.sum("value").alias("grand")).withColumn("_k", F.lit(1))
    return (
        val.withColumn("_k", F.lit(1))
        .join(F.broadcast(total), "_k")
        .filter(F.col("value") > F.col("grand") * F.lit("0.005").cast("decimal(6,4)"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — conditional aggregation over a join ("slow" lines =
    shipped >60 days after ordering; linestatus stands in for the
    missing shipmode). Both date predicates push into the lineitem
    scan; the orders join shuffles on orderkey once."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — NOT IN subquery + multi-key distinct count (negative
    account balance stands in for the complaints filter). NOT IN
    becomes a left_anti join (safe here: s_suppkey is non-null, so the
    three-valued-logic trap of NOT IN doesn't bite); the distinct
    count shuffles (brand,type,size,suppkey) once."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    ),
    pt AS (SELECT l_partkey, SUM(qty) AS part_qty FROM sp GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM sp
      JOIN pt ON sp.l_partkey = pt.l_partkey
      JOIN part ON p_partkey = sp.l_partkey
      JOIN supplier ON s_suppkey = sp.l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE 'small%'
      AND qty > part_qty * CAST(0.5 AS DECIMAL(2,1))
    ORDER BY s_suppkey
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — semi-join on an aggregate predicate: suppliers who
    shipped more than half of a small-part's 1997 volume (availqty is
    absent, so "dominates the part's flow" replaces "holds excess
    stock"). Two aggregations reuse the same (suppkey,partkey) →
    (partkey) shuffle chain; the comparison is exact DECIMAL."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    pt = sp.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        sp.join(pt, "l_partkey")
        .join(F.broadcast(part), sp.l_partkey == part.p_partkey)
        .filter(F.col("qty") > F.col("part_qty") * F.lit("0.5").cast("decimal(2,1)"))
        .join(F.broadcast(supplier), sp.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "q21_last_to_ship_suppliers",
    oracle="""
    WITH f AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    per_sup AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sup_last
        FROM f GROUP BY l_orderkey, l_suppkey
    ),
    per_ord AS (
        SELECT l_orderkey,
               MAX(sup_last) AS ord_last,
               COUNT(*) AS n_suppliers,
               SUM(CASE WHEN sup_last = mx THEN 1 ELSE 0 END) AS n_last
        FROM (
            SELECT *, MAX(sup_last) OVER (PARTITION BY l_orderkey) AS mx
            FROM per_sup
        ) GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM per_sup
      JOIN per_ord ON per_sup.l_orderkey = per_ord.l_orderkey
      JOIN supplier ON s_suppkey = per_sup.l_suppkey
    WHERE sup_last = ord_last AND n_suppliers > 1 AND n_last = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — the "kept others waiting" pattern: in finished
    multi-supplier orders, the sole supplier whose latest shipment is
    the order's latest (shipdate stands in for the missing
    commit/receipt dates). The classic formulation is a correlated
    EXISTS + NOT EXISTS pair — two extra self-joins of the fact; here
    both conditions fold into ONE aggregation per (order, supplier)
    plus unbounded windows over the order — NO per-order re-aggregation
    and NO self-join back to the per-supplier relation (the window
    carries ord_last/n_suppliers/n_last to every row in place), which
    at 100 TB removes two fact-sized shuffles and all
    correlated-subquery re-scans. A/B at sf0.1: 9 exchanges/4 sorts →
    5 exchanges/1 sort, 1.32s → 0.90s warm, identical output."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # no broadcast hint: orders is fact-sized at real scale — Catalyst
    # broadcasts it when small (AQE) and otherwise shuffle-joins on
    # l_orderkey, an exchange the groupBy and window below reuse
    # (HashPartitioning(ok) satisfies their clustering).
    f = li.join(
        orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).drop("o_orderkey")
    per_sup = f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("sup_last")
    )
    w = Window.partitionBy("l_orderkey")
    ann = (
        per_sup.withColumn("ord_last", F.max("sup_last").over(w))
        .withColumn("n_suppliers", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_last",
            F.sum(
                F.when(F.col("sup_last") == F.col("ord_last"), 1).otherwise(0)
            ).over(w),
        )
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        ann.filter(
            (F.col("sup_last") == F.col("ord_last"))
            & (F.col("n_suppliers") > 1)
            & (F.col("n_last") == 1)
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "extract_procedure_pages_fixture",
    oracle="""
    SELECT * FROM (VALUES
        ('99213', 'ok'),
        ('J0120', 'ok'),
        ('XXXXX', 'error_404'),
        ('J9999', 'deleted_listing'),
        ('0001M', 'deleted'),
        ('0042T', 'ok'),
        ('NOFIX', 'fetch_error')
    ) AS t(code, status)
    """,
)
def extract_procedure_pages_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CORE operator — fetch → parse → three-output
    extraction (``operators/extract.py``, reference
    ``procedure_code.py:221-661``) — in the driver gate, driven by the
    committed fixture pages (all six page variants: normal CPT/HCPCS,
    404, deleted, deleted-listing, empty-tabs, plus a fetch failure).
    The oracle pins the per-code status outcomes as a VALUES literal —
    golden results for the one operator whose semantics no SQL can
    express (HTML parsing), so the gate still hash-checks it instead
    of falling back to rows-only."""
    import functools

    from ..operators.extract import extract_procedure_pages
    from ..schemas import CODES_INPUT_SCHEMA
    from ..sources.fetcher import FixtureFetcher

    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        "fixtures",
    )
    pages = {}
    for code, name in {
        "99213": "cpt_normal.html",
        "J0120": "hcpcs_normal.html",
        "XXXXX": "page_404.html",
        "J9999": "deleted_hcpcs_listing.html",
        "0001M": "deleted_code.html",
        "0042T": "cpt_empty_tabs.html",
    }.items():
        with open(os.path.join(fixdir, name), encoding="utf-8") as handle:
            pages[code] = handle.read()
    urls = {
        "99213": "https://example.test/cpt-codes/99213",
        "0042T": "https://example.test/cpt-codes/0042T",
        "0001M": "https://example.test/cpt-codes/0001M",
        "J0120": "https://example.test/hcpcs-codes/J0120",
        "J9999": "https://example.test/hcpcs-codes/J9999",
    }
    factory = functools.partial(FixtureFetcher, pages=pages, urls=urls)
    codes = spark.createDataFrame(
        [(c,) for c in ["99213", "J0120", "XXXXX", "J9999", "0001M", "0042T", "NOFIX"]],
        CODES_INPUT_SCHEMA,
    )
    extracted = extract_procedure_pages(
        codes, factory, base_url="https://example.test/cpt-codes/"
    )
    return extracted.select("code", "status")


@register(
    "streaming_distinct_user_event_types",
    oracle="""
    SELECT user_id, event_type
    FROM events
    GROUP BY user_id, event_type
    """,
)
def streaming_distinct_user_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming exact dedup in the gate: dropDuplicates over an
    unbounded stream (state = one row per distinct key) must emit
    exactly batch DISTINCT. Fourth streaming gate query — with
    tumbling/sliding/session windows this covers every stateful
    streaming primitive the engine claims."""
    from ..streaming.events import read_events_stream, run_to_memory

    staged = _stage_events(sf_dir)
    _STREAM_SEQ[0] += 1
    name = f"stream_distinct_{_STREAM_SEQ[0]}"
    try:
        stream = read_events_stream(spark, staged).select(
            "user_id", "event_type"
        )
        query = (
            stream.dropDuplicates(["user_id", "event_type"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(60)
        query.stop()
    finally:
        _cleanup_staged(staged)
    return spark.table(name)


@register(
    "udtf_extract_modifiers_fixture",
    oracle="""
    SELECT * FROM (VALUES
        ('25', 'Significant separately identifiable E/M service'),
        ('59', 'Distinct procedural service')
    ) AS t(modifier, description)
    """,
)
def udtf_extract_modifiers_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text UDTF surface in the gate: ``LATERAL
    extract_modifiers(html)`` (operators/udtf.py) over the committed
    CPT fixture page, golden rows pinned as a VALUES oracle. Covers
    the one-row→many-rows lateral shape from SQL, complementing the
    mapInPandas path (extract_procedure_pages_fixture)."""
    import uuid

    from ..operators.udtf import register_udtfs

    register_udtfs(spark)
    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        "fixtures",
    )
    with open(
        os.path.join(fixdir, "cpt_normal.html"), encoding="utf-8"
    ) as handle:
        html = handle.read()
    view = f"udtf_gate_pages_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([("99213", html)], "code string, html string").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT m.* FROM {view}, LATERAL extract_modifiers(html) m"
    )
