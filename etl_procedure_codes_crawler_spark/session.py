"""SparkSession factory tuned for the engine.

Replaces the reference's external-engine delegation (Athena via
awswrangler, ``crawler/src/utils/athena.py:11-54``) with an in-process
Catalyst session. All defaults are chosen for scale-out behavior:

- AQE on (runtime coalesce, skew-join splitting, dynamic join strategy);
- Arrow on (every pandas-UDF / mapInPandas boundary is vectorized);
- shuffle partitions sized from the configured parallelism rather than
  the 200-row-chunk hand scheduling of the reference
  (``crawler/src/procedure_code.py:725``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "etl-procedure-codes-crawler-spark"


def default_parallelism() -> int:
    """Parallelism knob: honored by tests/bench via SPARK_GRAFT_CPUS."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[N]`` with N from SPARK_GRAFT_CPUS.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and sort-merge→broadcast conversion at 100TB scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every Python<->JVM data transfer.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Partition-size ceiling so scans split into memory-safe tasks.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Broadcast policy (round 12): the STATIC planner must never
        # pick broadcast joins — its size estimate for explode-derived
        # relations (shingle/gram/band rows) is fiction, and at 500k
        # docs it estimated corpus-sized gram relations under the old
        # 64 MB threshold and OOMed the driver building the broadcast
        # tables (the works-at-sf0.1/dies-at-100x class). AQE instead
        # promotes joins to broadcast from RUNTIME sizes (truth), and
        # explicit F.broadcast()/hint sites still force it where the
        # code knows the relation is bounded.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        # Semantics pins, set HERE for sessions this engine owns.
        # plans.relational.load() re-pins the same two values at the
        # query seam because the correctness gate runs queries in a
        # session it builds itself — that re-pin is an idempotent
        # no-op for sessions created by this factory.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        # Python DataSource filter pushdown (sources/datasource.py):
        # lets pushFilters prune the crawl set before any fetch.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Robustness to parquet files carrying TIMESTAMP(NANOS), which
        # Spark otherwise rejects outright: read as long; the actual
        # dtype is then inspected and normalized at the source
        # (functions/timestamps.py) — never assumed.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # REVERTED (round 13, verdict r12 #6): round 12's unmeasured
        # JVM twiddles — spark.sql.codegen.cache.maxEntries=10000 and
        # -XX:ReservedCodeCacheSize=512m — were A/B-benched this round
        # and removed. Raw headline totals favored ON (162.7 vs
        # 216.8 s) but the host yardstick moved 0.88 → 1.32 between
        # the arms (box-normalized the OFF arm was FASTER), and only
        # the ON arm exhibited a 6x late-JVM isolation-recheck decay —
        # consistent with the 10000-entry cache PINNING every
        # generated class (their compiled nmethods can never be
        # evicted, raising JIT code-cache pressure late in a ~200-plan
        # session). No reproducible win + one plausible harm + the
        # static-conf first-session-only caveat (ADVICE r12) = revert
        # per guide §1.2 (configuration last, only with measurement).
        # Numbers in OPTIMIZATION_r13.md.
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
