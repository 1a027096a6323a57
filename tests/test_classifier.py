"""Distributed logistic-regression quality classifier
(llm/classifier.py): convergence, determinism, separability, and the
end-to-end corpus gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from crane_spark.llm.classifier import (
    logreg_score,
    logreg_train,
    quality_features,
    train_language_gate,
)
from crane_spark.tables import table


def _separable(spark, n=60):
    """Linearly separable 2-feature data (plus bias): y = x1 > 0."""
    rows = []
    for i in range(n):
        x1 = (i % 11) - 5 + (0.1 if i % 2 else -0.1)
        x2 = ((i * 7) % 13) / 13.0
        rows.append(([1.0, float(x1), x2], 1 if x1 > 0 else 0))
    return spark.createDataFrame(rows, "features array<double>, label int")


def test_logreg_loss_decreases_and_separates(spark):
    data = _separable(spark)
    w, losses = logreg_train(data, n_iter=25, lr=1.0)
    # full-batch GD on a convex loss with a sane lr: monotone decrease
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    assert losses[-1] < losses[0] / 2
    scored = data.select(
        "label", (logreg_score(data, w) > 0.5).cast("int").alias("pred")
    )
    acc = scored.filter("label = pred").count() / scored.count()
    assert acc == 1.0  # separable -> perfect on train


def test_logreg_training_is_reproducible(spark):
    data = _separable(spark)
    assert logreg_train(data, n_iter=8, lr=0.7) == logreg_train(
        data, n_iter=8, lr=0.7
    )


def test_quality_features_shape_and_ranges(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    feats = quality_features(docs).collect()
    assert len(feats) == 50
    for r in feats:
        f = r["features"]
        assert len(f) == 5 and f[0] == 1.0
        assert f[1] >= 0 and 0 <= f[3] <= 1 and 0 <= f[4] <= 1


def test_language_gate_end_to_end(spark, sf_dir):
    """The trained gate must beat the majority-class baseline on its
    own training corpus (the fixture langs differ in stopword/token
    statistics) and emit calibrated scores in [0, 1]."""
    docs = table(spark, sf_dir, "documents")
    weights, losses, scored = train_language_gate(docs, n_iter=15, lr=1.0)
    assert losses[-1] < losses[0]
    rows = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")),
        "doc_id",
    ).select("y", "quality_score")
    got = rows.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in got)
    acc = sum((r["quality_score"] > 0.5) == (r["y"] == 1) for r in got) / len(got)
    base = max(sum(r["y"] for r in got), sum(1 - r["y"] for r in got)) / len(got)
    assert acc >= base  # never worse than predicting the majority
