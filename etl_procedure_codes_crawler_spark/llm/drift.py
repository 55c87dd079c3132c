"""Distribution-drift monitoring between corpus slices.

A 100 TB training pipeline mixes many sources and re-ingests
continuously; the operational question is "did source X's token
distribution move away from the corpus?" — the signal behind mixture
re-weighting and ingest anomaly alarms.

Drift here is **total-variation distance** between each source's
unigram distribution p and the corpus-wide distribution q:

    TV(p, q) = 1/2 · Σ_t |p(t) − q(t)|
             = Σ_t |cnt_s(t)·N_c − cnt_c(t)·N_s| / (2·N_s·N_c)

The second form is the one implemented: the numerator is an exact
BIGINT sum (order-independent, so Spark's partial aggregation order
cannot perturb it), and the single IEEE division at the end is
bit-identical across engines — the same rational-arithmetic discipline
as the repo's moment/OLS queries. KL divergence would need libm
``log``, which Java's StrictMath and DuckDB's libm do not guarantee to
the last ulp; TV needs no transcendentals and is a true metric.

Scale shape: ONE corpus-sized shuffle (the (source, token) count);
everything downstream is vocabulary×sources sized. The token-level
marginal rides the first aggregation's output (map-side combined), and
the final join broadcasts the vocabulary-sized marginal table.

Overflow bound: the products are cnt·N ≤ N² — fine in BIGINT up to
N ≈ 3·10⁹ tokens per slice; beyond that swap the two product columns
to DECIMAL(38,0) (one-line change, noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text as T


def token_drift_by_source(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source unigram drift vs the whole corpus.

    Returns one row per source: ``(source, n_tokens, tv_distance,
    top_token)`` where ``top_token`` is the most over-represented
    token in that source relative to the corpus (ties broken by
    token string, so the output is deterministic).
    """
    toks = df.select(
        F.col(group_col).alias("source"),
        F.explode(T.tokens(text_col)).alias("token"),
    )
    # corpus-sized shuffle #1 (and the only one): per-(source, token)
    # counts with map-side partial aggregation
    st = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("cnt_s")
    # vocab×sources sized — pin it so the four downstream consumers
    # read this tiny table instead of re-running the corpus scan
    ).localCheckpoint(eager=True)
    # everything below is vocab×sources sized
    tok = st.groupBy("token").agg(F.sum("cnt_s").alias("cnt_c"))
    src = st.groupBy("source").agg(F.sum("cnt_s").alias("n_s"))
    # the corpus total is ONE number off the pinned vocab-sized table —
    # fold it in as a literal (a broadcast cross join would put a
    # nested-loop operator in the plan for no reason)
    n_c_val = int(st.agg(F.sum("cnt_s")).first()[0] or 0)
    joined = (
        st.join(F.broadcast(tok), "token")
        .join(F.broadcast(src), "source")
        .withColumn("n_c", F.lit(n_c_val))
        # cnt·N products stay BIGINT-exact to ~3e9 tokens/slice; cast
        # these two to decimal(38,0) for corpora beyond that
        .withColumn(
            "diff", F.col("cnt_s") * F.col("n_c") - F.col("cnt_c") * F.col("n_s")
        )
    )
    # tokens ABSENT from a source contribute |0·N_c − cnt_c·N_s| each;
    # rather than materializing source×vocab rows, fold them in closed
    # form: Σ_{t∉s} cnt_c·N_s = N_s·(N_c − Σ_{t∈s} cnt_c)
    per_source = joined.groupBy("source", "n_s", "n_c").agg(
        F.sum(F.abs(F.col("diff"))).alias("abs_present"),
        F.sum("cnt_c").alias("cov_s"),
    ).withColumn(
        "abs_sum",
        F.col("abs_present")
        + F.col("n_s") * (F.col("n_c") - F.col("cov_s")),
    )
    top = (
        joined.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("diff").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .select("source", F.col("token").alias("top_token"))
    )
    return (
        per_source.join(top, "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            (
                F.col("abs_sum").cast("double")
                / (F.lit(2) * F.col("n_s") * F.col("n_c")).cast("double")
            ).alias("tv_distance"),
            "top_token",
        )
    )
