"""Poisson bootstrap: uncertainty quantification for corpus statistics
in ONE distributed pass (Chamandy, Muralidharan, Najmi & Naidu 2012,
"Estimating Uncertainty for Massive Data Streams" — the map-reduce
bootstrap Google built for exactly this shape).

The classical bootstrap resamples n rows WITH replacement B times —
impossible to do literally at corpus scale (each replicate is a full
shuffle of the corpus). The Poisson trick: in a resample of size n,
each row's multiplicity is Binomial(n, 1/n) → Poisson(1) as n grows,
and Poisson draws are INDEPENDENT per row — so every row can generate
its own B multiplicities locally, with no coordination, no global
sample, no second pass. One explode (×B) plus a groupBy computes all
B replicate statistics; the per-group spread of replicate means IS the
sampling distribution.

Determinism (what makes this family hash-oracle-able — engines do not
share an RNG): the uniform draw is md5-derived (u = md5-60(doc_id:b)
/ 2^60, the cross-engine hash trick from llm/kmv.py), and the
Poisson(1) inverse CDF is applied via PRECOMPUTED decimal literal
thresholds (cumulative e⁻¹·Σ1/k!) — libm's exp never runs at query
time in either engine, so the weights are bit-reproducible. Replicate
sums stay INTEGER (weight × token count), and each replicate mean is
a single IEEE division of two exact integers — no float-accumulation
order to disagree on. Weights are capped at 7 (P(Poisson(1) > 7) ≈
1e-8; at that point u's 60 bits are the binding precision anyway).

The interval is the order-statistic CI: replicate means ranked per
group, ranks 2 and B-1 of B=32 (≈93.75% coverage). Replicates whose
total weight is zero are dropped in BOTH engines before ranking
(P ≈ e^(-group size) — astronomically rare for any real group, but
NULL ordering differs across engines, so the contract is pinned, not
latent)."""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cumulative Poisson(1) CDF at k = 0..6, as exact double literals —
#: shared verbatim with the DuckDB oracle (see queries.py)
POISSON1_CUM: tuple[float, ...] = tuple(
    c
    for c in (lambda: (
        # computed once at import; repr()-stable doubles
        [sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
         for k in range(7)]
    ))()
)


def poisson1_weight(u: Column) -> Column:
    """Poisson(1) multiplicity via inverse CDF over literal
    thresholds: w = #{k : u > F(k)} ∈ [0, 7]."""
    w = F.lit(0)
    for t in POISSON1_CUM:
        w = w + (u > F.lit(float(t))).cast("int")
    return w


def u60(*cols: Column) -> Column:
    """Cross-engine uniform in (0, 1): md5-60 of the concatenated key
    over 2^60 (llm/kmv.py hash trick)."""
    key = F.concat_ws(":", *cols)
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return h / F.lit(float(1 << 60))


def bootstrap_ci_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
    n_replicates: int = 32,
    lo_rank: int = 2,
    hi_rank: int | None = None,
) -> DataFrame:
    """(group, mean, ci_lo, ci_hi): the group mean of ``value_col``
    (must be integer-typed — replicate sums stay exact) with its
    order-statistic Poisson-bootstrap interval.

    Scale shape: the ×B explode is the only inflation and it carries
    three small columns, not the corpus; one groupBy computes all
    B·|groups| replicate means map-side-combined; ranking runs on the
    metadata-sized replicate relation."""
    if hi_rank is None:
        hi_rank = n_replicates - 1
    d = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("bigint").alias("_n"),
    ).where(F.col(group_col).isNotNull() & F.col(id_col).isNotNull())
    # the id filter pins the NULL contract cross-engine: Spark's
    # concat_ws SKIPS a NULL argument (a NULL id would still draw a
    # real uniform) while SQL '||' propagates NULL (weight 0) — so
    # NULL ids are excluded on both sides instead
    rep = d.select(
        "grp",
        "_id",
        "_n",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("b"),
    )
    w = rep.withColumn(
        "w", poisson1_weight(u60(F.col("_id").cast("string"), F.col("b").cast("string")))
    )
    means = (
        w.groupBy("grp", "b")
        .agg(
            F.sum(F.col("w").cast("bigint") * F.col("_n")).alias("_wn"),
            F.sum(F.col("w").cast("bigint")).alias("_w"),
        )
        .filter(F.col("_w") > 0)
        .select(
            "grp", "b", (F.col("_wn").cast("double") / F.col("_w")).alias("m")
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.asc("m"), F.asc("b"))
    )
    ranked = means.withColumn("rk", rk)
    ci = ranked.groupBy("grp").agg(
        F.max(F.when(F.col("rk") == lo_rank, F.col("m"))).alias("_lo"),
        F.max(F.when(F.col("rk") == hi_rank, F.col("m"))).alias("_hi"),
    )
    base = d.groupBy("grp").agg(
        (F.sum("_n").cast("double") / F.count(F.lit(1))).alias("_mean")
    )
    return base.join(ci, "grp").select(
        F.col("grp").alias("group"),
        F.round("_mean", 4).alias("mean_value"),
        F.round("_lo", 4).alias("ci_lo"),
        F.round("_hi", 4).alias("ci_hi"),
    )
