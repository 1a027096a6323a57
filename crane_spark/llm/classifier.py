"""Distributed training of a document-quality classifier: logistic
regression by full-batch gradient descent, where every iteration is
ONE aggregate over the corpus.

This is the workhorse model class of real corpus curation (fastText /
logistic quality filters a la CCNet, FineWeb-style classifier gates):
cheap text statistics in, a calibrated keep/drop score out. The Spark
shape mirrors `kmeans_train`: model state (a handful of weights) lives
on the driver and BROADCASTS into the plan as a literal; the corpus
never moves — each iteration computes the gradient with a decimal-
summed hash aggregate (order-independent, bit-reproducible on any
partitioning — the same guarantee every money aggregate in this engine
makes), and only (dim+1) scalars come back to the driver. 100 TB of
documents train at one corpus scan per iteration with zero shuffle
beyond the aggregate's partial/final split.

Features are JVM-side expressions (no Python in the scan); the
sigmoid/gradient arithmetic is plain codegen'd math. Determinism: per-
row gradient contributions are rounded to a 1e-9 grid before the
decimal sum, so training runs are bit-identical regardless of
parallelism (pinned by test).

Reference lineage: the reference has no model training at all; this is
north-star gap-fill (SURVEY.md §2.2, LLM extensions).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crane_spark.functions.text import tokens
from crane_spark.tables import fan_out

GRID = 9  # decimal places of the per-row rounding grid


#: dimensionality of quality_features' output (bias + 4 statistics) —
#: statically known, so training over these features can skip the
#: first()-row sizing job (see logreg_train's `dim`).
QUALITY_FEATURES_DIM = 5


def quality_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep=(),
) -> DataFrame:
    """(id, features array<double>) — cheap, scan-local text
    statistics: [bias, log1p(n_tokens), mean token length, stopword
    ratio, digit ratio]. All codegen'd expressions; one pass.

    ``keep`` — extra (name, Column) pairs evaluated IN the same scan
    and carried alongside the features: the training label rides the
    featurize projection instead of joining back to the source table
    by id (r10, guide §2.2: the join shipped every feature row through
    an exchange just to attach a column the scan could compute)."""
    d = fan_out(docs).select(
        F.col(id_col),
        F.col(text_col),
        tokens(text_col).alias("toks"),
        *[c.alias(nm) for nm, c in keep],
    )
    n_toks = F.size("toks").cast("double")
    stop = F.size(
        F.filter(
            "toks",
            lambda t: t.isin("the", "a", "an", "and", "or", "of", "to", "in", "is"),
        )
    ).cast("double")
    chars = F.length(F.col(text_col)).cast("double")
    digits = chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", "")).cast(
        "double"
    )
    return d.select(
        F.col(id_col),
        F.array(
            F.lit(1.0),
            F.log1p(n_toks),
            F.when(n_toks > 0, (chars - n_toks + 1) / n_toks).otherwise(0.0),
            F.when(n_toks > 0, stop / n_toks).otherwise(0.0),
            F.when(chars > 0, digits / chars).otherwise(0.0),
        ).alias("features"),
        *[nm for nm, _c in keep],
    )


def logreg_train(
    data: DataFrame,
    n_iter: int = 20,
    lr: float = 0.5,
    features_col: str = "features",
    label_col: str = "label",
    reliable: bool = False,
    dim: int | None = None,
    keep_cols: tuple[str, ...] = (),
):
    """Full-batch logistic regression; returns (weights, per-iteration
    mean log-loss). ``data`` is (features array<double>, label 0/1).

    Per iteration: broadcast w as a literal array, compute
    p = sigmoid(w.x) per row, and aggregate the per-dimension
    gradient sum((p - y) * x_d) plus the log-loss — one job, dim+1
    scalars collected. The driver applies w -= lr * grad / n.

    Features are STANDARDIZED internally (one extra aggregate for
    per-dimension mean/std; dimension 0 is assumed to be the bias and
    left alone): full-batch GD on raw text statistics with mixed
    scales (log-token-counts ~9 vs ratios ~0.1) is so ill-conditioned
    that any lr large enough to move the small dimensions oscillates
    the big ones (observed divergence on the fixture corpus). The
    returned weights are FOLDED BACK to raw-feature space
    (w_d/std_d, bias -= sum w_d*mean_d/std_d), so `logreg_score`
    serves on raw features with no scaling state to carry.

    The loop's only executor-storage dependency is the standardized
    input pinned below — weights live on the driver — so durability
    here is a single switch, not a cadence: ``reliable=True`` pins the
    input with a durable ``df.checkpoint()`` instead of
    localCheckpoint (identical rows; training is bit-identical), and a
    lost executor recomputes scans from the checkpoint files instead
    of killing the train (operators/caching.py docstring).

    r10 (guide §1.2/§2.4 — the query's floor was job count x per-job
    scheduling, not arithmetic): the pipeline pays exactly ONE scan of
    the input expressions. RAW (features, label) rows are pinned
    FIRST; the sizing/moments jobs and every iteration read the pinned
    blocks instead of re-running the featurize scan (previously: one
    scan each for the head job, the moments job, and the checkpoint).
    The standardization is folded into the per-iteration expressions —
    the same (x_i - mean_i) / std_i float64 division the stored-array
    form precomputed, applied to the same values, so every margin,
    gradient and loss is bit-identical (pinned by the reproducibility
    test). ``dim`` declares a statically-known feature dimensionality
    (e.g. QUALITY_FEATURES_DIM) and skips the first()-row job; n now
    comes from the moments aggregate. Iterations run over a
    byte-derived coalesce of the pinned blocks (~32 MB/task, floor 1)
    so a small corpus doesn't schedule defaultParallelism tasks per
    iteration — partitioning never changes results (the decimal-grid
    sums are order-independent by contract). ``keep_cols`` pins extra
    columns (e.g. the doc id) through the checkpoint and switches the
    return to (weights, losses, pinned): serving scores the pinned
    rows instead of re-featurizing the corpus."""
    raw = data.select(
        *keep_cols,
        F.col(features_col).alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )
    if reliable:
        from crane_spark.operators.caching import ensure_checkpoint_dir

        ensure_checkpoint_dir(raw.sparkSession)
        ckpt = raw.checkpoint(eager=True)
    else:
        ckpt = raw.localCheckpoint(eager=True)

    if dim is None:
        dim = len(ckpt.select(F.col("x").alias("f0")).first()["f0"])

    def dgrid9(col):
        return F.round(col, GRID).cast(f"decimal(28,{GRID})")

    stat_aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(1, dim):
        xi = F.element_at("x", i + 1)
        stat_aggs.append(F.sum(dgrid9(xi)).cast("double").alias(f"s{i}"))
        stat_aggs.append(F.sum(dgrid9(xi * xi)).cast("double").alias(f"q{i}"))
    stats = ckpt.agg(*stat_aggs).collect()[0]
    n = int(stats["n"])
    mean = [0.0] * dim
    std = [1.0] * dim
    for i in range(1, dim):
        mean[i] = float(stats[f"s{i}"]) / n
        var = max(float(stats[f"q{i}"]) / n - mean[i] ** 2, 0.0)
        std[i] = math.sqrt(var) if var > 1e-24 else 1.0

    # ~32 MB of (x, y) doubles per iteration task; coalesce only ever
    # MERGES the pinned blocks, so a big corpus keeps its scan-derived
    # partitioning and a small one stops paying defaultParallelism
    # scheduled tasks per iteration job.
    row_bytes = 8 * dim + 24
    parts = max(1, -(-n * row_bytes // (32 << 20)))
    d = ckpt.select("x", "y").coalesce(parts)

    scaled = F.array(
        F.element_at("x", 1),
        *[
            (F.element_at("x", i + 1) - F.lit(mean[i])) / F.lit(std[i])
            for i in range(1, dim)
        ],
    )

    w = [0.0] * dim
    losses: list[float] = []
    for _ in range(n_iter):
        w_lit = F.array(*[F.lit(float(v)) for v in w])
        margin = F.aggregate(
            F.zip_with(w_lit, scaled, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        resid = p - F.col("y")
        # clamp keeps log() finite at saturated probabilities
        pc = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        loss_term = -(
            F.col("y") * F.log(pc) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - pc)
        )

        def dgrid(col):
            return F.round(col, GRID).cast(f"decimal(28,{GRID})")

        aggs = [
            F.sum(dgrid(resid * F.element_at(scaled, i + 1)))
            .cast("double")
            .alias(f"g{i}")
            for i in range(dim)
        ] + [F.sum(dgrid(loss_term)).cast("double").alias("loss")]
        row = d.agg(*aggs).collect()[0]
        losses.append(float(row["loss"]) / n)
        w = [w[i] - lr * float(row[f"g{i}"]) / n for i in range(dim)]
    # fold the standardization into the weights: raw-space serving
    w_raw = [w[0] - sum(w[i] * mean[i] / std[i] for i in range(1, dim))] + [
        w[i] / std[i] for i in range(1, dim)
    ]
    if keep_cols:
        pinned = ckpt.select(*keep_cols, F.col("x").alias(features_col))
        return w_raw, losses, pinned
    return w_raw, losses


def logreg_score(
    df: DataFrame, weights: list[float], features_col: str = "features"
):
    """sigmoid(w . features) as a Column — the serving side."""
    w_lit = F.array(*[F.lit(float(v)) for v in weights])
    margin = F.aggregate(
        F.zip_with(w_lit, F.col(features_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def train_language_gate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_expr=None,
    n_iter: int = 15,
    lr: float = 1.0,
) -> tuple[list[float], list[float], DataFrame]:
    """End-to-end corpus gate: featurize, train against a label (by
    default: lang == 'en'), and return (weights, losses, scored docs)
    where scored docs carry `quality_score` in [0, 1]."""
    label = (
        label_expr if label_expr is not None else (F.col("lang") == "en").cast("int")
    )
    # One corpus scan end to end (r10): the label rides the featurize
    # projection (no join back to docs), dim is static so training
    # skips its sizing job, and serving scores the rows logreg_train
    # pinned instead of featurizing the corpus a second time. Same
    # (features, label) rows in, same expressions per row — weights,
    # losses and scores are bit-identical to the joined form.
    train = quality_features(docs, text_col, id_col, keep=(("label", label),))
    weights, losses, pinned = logreg_train(
        train,
        n_iter=n_iter,
        lr=lr,
        dim=QUALITY_FEATURES_DIM,
        keep_cols=(id_col,),
    )
    scored = pinned.select(
        F.col(id_col), logreg_score(pinned, weights).alias("quality_score")
    )
    return weights, losses, scored


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
