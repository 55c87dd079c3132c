"""In-engine multiclass softmax classifier trained by distributed
full-batch gradient descent — the ITERATIVE-optimization counterpart
of :mod:`.quality`'s closed-form ridge (`fit_linear_quality` solves
normal equations in one pass; softmax has no closed form, so corpus
pipelines train their fastText/logistic quality and domain filters by
gradient steps).

Execution shape (the part that matters at 100 TB): the model is
driver-side state folded into column LITERALS each step — no
parameter server, no Python on executors. One iteration is ONE
map-side-combinable aggregation job over the (checkpointed) feature
relation:

    gradient[c][j] = Σ_rows (softmax_c(W·x) − 1[y=c]) · x_j

Every softmax/logit term is a pure JVM column expression, so the scan
stays in whole-stage codegen and the ONLY bytes that cross the wire
per iteration are the c·(f+1)+1 partial sums per partition (the same
"20 numbers per partition" scaling argument as the quality trainer's
moment pass). Per-iteration cost is therefore one corpus scan over a
cached projection of f+1 doubles per row; 30 iterations of a 5-class
4-feature model ship ~150 doubles per partition per pass, independent
of corpus size.

Numerical notes: logits are max-shifted before exp (standard
stability), features are standardized from a one-job moment pass, and
the update happens in float64 on the driver. Training is
deterministic up to float-sum partition order (≈1e-15 relative per
step); tests pin the learned weights against an independent numpy
replica at 1e-6 and require exact argmax agreement — registered
rows-only (libm exp() is not guaranteed identically rounded across
engines, the same reason lm_perplexity is rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _logits(weights: list[list[float]], feature_cols: list[str]) -> list[Column]:
    """One linear logit Column per class from literal weights
    [bias, w_1..w_f] — fixed term order, the model-as-literals
    pattern."""
    out = []
    for row in weights:
        z = F.lit(float(row[0]))
        for j, c in enumerate(feature_cols):
            z = z + F.lit(float(row[j + 1])) * F.col(c)
        out.append(z)
    return out


def _softmax_cols(
    logits: list[Column],
) -> tuple[list[Column], Column, Column]:
    m = F.greatest(*logits) if len(logits) > 1 else logits[0]
    exps = [F.exp(z - m) for z in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    return [e / denom for e in exps], m, denom


def standardize_stats(
    df: DataFrame, feature_cols: list[str]
) -> tuple[list[float], list[float]]:
    """(means, stds) from one aggregation job; std floors at 1e-12 so
    a constant feature cannot divide by zero."""
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(F.col(c)).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(F.col(c)).alias(f"s_{c}"))
    row = df.agg(*aggs).first()
    means = [float(row[f"m_{c}"]) for c in feature_cols]
    stds = [max(float(row[f"s_{c}"] or 0.0), 1e-12) for c in feature_cols]
    return means, stds


def softmax_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_classes: int,
    iters: int = 50,
    lr: float = 5.0,
    l2: float = 1e-4,
    momentum: float = 0.9,
) -> dict:
    """Train; returns {"weights": c×(f+1) nested lists over
    STANDARDIZED features (col 0 = bias), "means", "stds", "loss":
    final mean cross-entropy}. ``label_col`` must hold ints in
    [0, n_classes).

    The input projection is localCheckpoint'ed — ``iters + 1`` jobs
    consume it and recomputing upstream feature math per step would
    multiply the corpus scans.
    """
    feats = df.select(
        F.col(label_col).cast("int").alias("_y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    ).localCheckpoint(eager=True)
    n_rows = feats.count()
    if n_rows == 0:
        raise ValueError("softmax_train: empty input")
    means, stds = standardize_stats(feats, feature_cols)
    std_cols = [
        ((F.col(c) - F.lit(means[j])) / F.lit(stds[j])).alias(c)
        for j, c in enumerate(feature_cols)
    ]
    # Right-size the iterated relation: feature rows are a few doubles,
    # so the corpus's scan partitioning is massive overkill — ``iters``
    # sequential jobs each dispatch one task per partition. Target
    # ≥64k rows per partition, capped at the session parallelism.
    spark = df.sparkSession
    parts = max(1, min(
        spark.sparkContext.defaultParallelism, (n_rows + 65535) // 65536
    ))
    z = feats.select("_y", *std_cols).repartition(parts).localCheckpoint(
        eager=True
    )

    W = [[0.0] * (len(feature_cols) + 1) for _ in range(n_classes)]
    # Polyak momentum, driver-side: near-separable targets (the
    # normal case for distillation labels) make plain GD crawl toward
    # the max-margin boundary — momentum cuts the iteration count
    # (= Spark job count; the only sequential cost here) ~4x for the
    # same agreement. All optimizer state stays on the driver.
    V = [[0.0] * (len(feature_cols) + 1) for _ in range(n_classes)]
    loss = float("nan")
    # Per-step wall cost is DRIVER ROUND-TRIP latency (plan + schedule
    # + fetch ~0.4 s in local mode), not compute: toggling codegen off
    # and shrinking partitions were both measured ~neutral at sf0.1.
    # The loop is inherently sequential, so the iteration count IS the
    # latency budget — hence momentum (4x fewer steps than plain GD
    # for the same agreement, all optimizer state driver-side).
    for _ in range(iters):
        logits = _logits(W, feature_cols)
        probs, m, denom = _softmax_cols(logits)
        aggs = []
        for c in range(n_classes):
            resid = probs[c] - (F.col("_y") == c).cast("double")
            aggs.append(F.sum(resid).alias(f"g_{c}_b"))
            for j, fc in enumerate(feature_cols):
                aggs.append(F.sum(resid * F.col(fc)).alias(f"g_{c}_{j}"))
        # mean cross-entropy: −l_y + m + ln(Σ exp(l−m)) per row
        ly = logits[0]
        for c in range(1, n_classes):
            ly = F.when(F.col("_y") == c, logits[c]).otherwise(ly)
        aggs.append(F.sum(m + F.log(denom) - ly).alias("loss"))
        g = z.agg(*aggs).first()
        loss = float(g["loss"]) / n_rows
        for c in range(n_classes):
            grad_b = float(g[f"g_{c}_b"]) / n_rows + l2 * W[c][0]
            V[c][0] = momentum * V[c][0] - lr * grad_b
            W[c][0] += V[c][0]
            for j in range(len(feature_cols)):
                grad = float(g[f"g_{c}_{j}"]) / n_rows + l2 * W[c][j + 1]
                V[c][j + 1] = momentum * V[c][j + 1] - lr * grad
                W[c][j + 1] += V[c][j + 1]
    return {
        "weights": W,
        "means": means,
        "stds": stds,
        "loss": loss,
        "n_rows": n_rows,
    }


def softmax_predict(
    df: DataFrame,
    model: dict,
    feature_cols: list[str],
    pred_col: str = "pred",
) -> DataFrame:
    """Append the argmax class — model-as-literals, one map-only
    projection (ties broken toward the lower class index,
    deterministically)."""
    means, stds = model["means"], model["stds"]
    std_exprs = {
        c: (F.col(c).cast("double") - F.lit(means[j])) / F.lit(stds[j])
        for j, c in enumerate(feature_cols)
    }
    logits = []
    for row in model["weights"]:
        zc = F.lit(float(row[0]))
        for j, c in enumerate(feature_cols):
            zc = zc + F.lit(float(row[j + 1])) * std_exprs[c]
        logits.append(zc)
    best = F.lit(0)
    best_z = logits[0]
    for c in range(1, len(logits)):
        is_better = logits[c] > best_z
        best = F.when(is_better, F.lit(c)).otherwise(best)
        best_z = F.when(is_better, logits[c]).otherwise(best_z)
    return df.withColumn(pred_col, best.cast("int"))
