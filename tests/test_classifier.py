"""Iterative softmax trainer (llm/classifier.py): the distributed
gradient loop must reproduce an independent numpy full-batch replica
step-for-step, and the distillation query must actually converge."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_procedure_codes_crawler_spark.llm import classifier as CL
from etl_procedure_codes_crawler_spark.llm import queries  # noqa: F401 — registers
from etl_procedure_codes_crawler_spark.plans.relational import QUERIES


def _numpy_replica(X, y, n_classes, iters, lr, l2, momentum):
    """Same standardize + momentum-GD recipe, fixed numpy sum order."""
    Xs = (X - X.mean(axis=0)) / np.maximum(X.std(axis=0), 1e-12)
    Xb = np.column_stack([np.ones(len(Xs)), Xs])
    W = np.zeros((n_classes, Xb.shape[1]))
    V = np.zeros_like(W)
    Y = np.eye(n_classes)[y]
    for _ in range(iters):
        Z = Xb @ W.T
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - Y).T @ Xb / len(Xb) + l2 * W
        V = momentum * V - lr * G
        W = W + V
    return W, Xb


class TestSoftmaxTrain:
    def _toy(self, spark, n=240, seed=3):
        rng = np.random.RandomState(seed)
        X = rng.randn(n, 3)
        # labels from a noiseless linear rule -> separable
        s = X @ np.array([1.0, -2.0, 0.5])
        y = np.digitize(s, np.quantile(s, [1 / 3, 2 / 3]))
        df = spark.createDataFrame(
            [
                (float(a), float(b), float(c), int(t))
                for (a, b, c), t in zip(X, y)
            ],
            ["f1", "f2", "f3", "y"],
        )
        return df, X, y

    def test_weights_match_numpy_replica(self, spark):
        df, X, y = self._toy(spark)
        model = CL.softmax_train(
            df, ["f1", "f2", "f3"], "y", n_classes=3,
            iters=25, lr=2.0, l2=1e-3, momentum=0.9,
        )
        W_np, _ = _numpy_replica(X, y, 3, 25, 2.0, 1e-3, 0.9)
        got = np.array(model["weights"])
        assert np.allclose(got, W_np, rtol=1e-6, atol=1e-8), (
            np.abs(got - W_np).max()
        )

    def test_predictions_match_replica_argmax(self, spark):
        df, X, y = self._toy(spark)
        model = CL.softmax_train(
            df, ["f1", "f2", "f3"], "y", n_classes=3,
            iters=25, lr=2.0, l2=1e-3, momentum=0.9,
        )
        W_np, Xb = _numpy_replica(X, y, 3, 25, 2.0, 1e-3, 0.9)
        want = (Xb @ W_np.T).argmax(axis=1)
        # key the comparison on the feature tuple (row order is not
        # preserved through Spark)
        pred_rows = CL.softmax_predict(
            df, model, ["f1", "f2", "f3"]
        ).collect()
        got = {
            (round(r["f1"], 9), round(r["f2"], 9), round(r["f3"], 9)): r["pred"]
            for r in pred_rows
        }
        agree = sum(
            got[(round(a, 9), round(b, 9), round(c, 9))] == w
            for (a, b, c), w in zip(X, want)
        )
        assert agree >= len(X) - 1  # fp-tie tolerance of one row

    def test_converges_on_separable_labels(self, spark):
        df, X, y = self._toy(spark)
        model = CL.softmax_train(df, ["f1", "f2", "f3"], "y", n_classes=3)
        out = CL.softmax_predict(df, model, ["f1", "f2", "f3"])
        acc = (
            out.filter(F.col("pred") == F.col("y")).count() / out.count()
        )
        assert acc >= 0.95
        assert model["loss"] < 0.35

    def test_empty_input_raises(self, spark):
        df = spark.createDataFrame([], "f1 double, y int")
        with pytest.raises(ValueError, match="empty"):
            CL.softmax_train(df, ["f1"], "y", n_classes=2, iters=1)


class TestQualityTierQuery:
    def test_distills_tiers_with_high_agreement(self, spark, sf_dir):
        rows = QUERIES["quality_tier_classifier_gd"](spark, sf_dir).collect()
        assert len(rows) > 0
        agree = sum(r["agree"] for r in rows) / len(rows)
        assert agree >= 0.95, agree
        # all three tiers present and roughly balanced (ntile thirds)
        import collections

        tiers = collections.Counter(r["tier"] for r in rows)
        assert set(tiers) == {0, 1, 2}
        assert max(tiers.values()) - min(tiers.values()) <= 1
