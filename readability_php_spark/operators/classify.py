"""Model-based quality filtering: train + apply a logistic-regression
document classifier inside the engine.

Every large pretraining pipeline runs a learned quality filter (GPT-3
filtered Common Crawl against a WebText-vs-crawl logistic classifier over
hashed features; LLaMA/CCNet score with a linear model; FineWeb-Edu uses a
learned educational-quality scorer).  This module is that step, Spark-first:
features come from :func:`~readability_php_spark.operators.text_analysis.
hashed_tf_embedding` (or any ``array<double>`` column), training is
full-batch gradient descent expressed as DataFrame aggregations, and
scoring is a broadcast dot product — no MLlib dependency, no Python in the
per-row path.

Scale shape (per GD iteration):
- scoring pass: dot(w, x) is a JVM ``aggregate``/``zip_with`` fold over a
  literal weight array — embarrassingly parallel, no shuffle;
- gradient: ``posexplode`` of the feature vector then one
  map-side-combined sum per dimension — the shuffle carries ``dim`` keys
  (16-256), i.e. nothing;
- update: a bounded ``dim+1``-value collect (same discipline as the
  k-centroid collects in similarity.py), weights re-broadcast as literals.
A 10^12-doc corpus pays one scan per iteration, which is the textbook
full-batch GD cost; switch the gradient input to a ``hash_sample`` of the
corpus for mini-batch behavior — the operator composes with
sampling.py unchanged.

Cross-engine determinism (the rounded-trajectory technique, see
operators/graph.py and similarity.py): the margin z, the sigmoid, each
per-dimension gradient SUM, and each updated weight are rounded to
``round_decimals`` at every step, so the whole training trajectory replays
exactly as unrolled SQL in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(vec_col, weights: list[float], bias: float, round_decimals: int):
    """round(bias + <w, v>, k) as a sequential JVM fold (deterministic
    summation order)."""
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    return F.round(
        F.lit(float(bias))
        + F.aggregate(
            F.zip_with(vec_col, w_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_decimals,
    )


def train_logreg(
    features: DataFrame,
    dim: int,
    feature_col: str = "embedding",
    label_col: str = "label",
    iterations: int = 3,
    lr: float = 1.0,
    round_decimals: int = 6,
) -> tuple[list[float], float]:
    """Full-batch GD for binary logistic regression; returns
    ``(weights, bias)`` after ``iterations`` steps from zero init.

    ``features`` needs ``feature_col: array<double>`` (length ``dim``)
    and ``label_col`` in {0, 1}.  Update rule per step, everything
    rounded to ``round_decimals``:

        r_i = sigmoid(round(b + <w, x_i>)) - y_i          (per doc)
        g_d = round(sum_i r_i * x_{i,d}) ; g_b = round(sum_i r_i)
        w_d := round(w_d - lr * g_d / n) ; b := round(b - lr * g_b / n)

    The per-iteration driver traffic is the ``dim+1`` gradient values —
    bounded and tiny; the data never leaves the executors.
    """
    feats = features.select(
        F.col(feature_col).alias("v"), F.col(label_col).cast("double").alias("y")
    ).persist()
    try:
        n = feats.count()  # bounded: one long
        if n == 0:
            raise ValueError("train_logreg: empty feature set")
        w = [0.0] * dim
        b = 0.0
        for _ in range(iterations):
            z = _dot(F.col("v"), w, b, round_decimals)
            resid = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_decimals) - F.col("y")
            with_r = feats.select("v", resid.alias("r"))
            grad_rows = (
                with_r.select(F.posexplode("v").alias("d", "x"), "r")
                .groupBy("d")
                .agg(F.round(F.sum(F.col("r") * F.col("x")), round_decimals).alias("g"))
                .collect()  # bounded: dim rows
            )
            g_bias = with_r.agg(
                F.round(F.sum("r"), round_decimals).alias("g")
            ).first()[0]
            grads = {row["d"]: row["g"] for row in grad_rows}
            w = [
                round(w[d] - lr * grads.get(d, 0.0) / n, round_decimals)
                for d in range(dim)
            ]
            b = round(b - lr * g_bias / n, round_decimals)
        return w, b
    finally:
        feats.unpersist()


def score_logreg(
    features: DataFrame,
    weights: list[float],
    bias: float,
    feature_col: str = "embedding",
    threshold: float = 0.5,
    round_decimals: int = 4,
    margin_decimals: int = 6,
) -> DataFrame:
    """Apply a trained model: adds ``score`` (sigmoid of the margin,
    rounded) and ``keep`` (score >= threshold).  Pure broadcast column
    algebra — composes into any pipeline stage as a narrow map.

    ``margin_decimals`` must match the ``round_decimals`` the model was
    TRAINED with (train_logreg default: 6) — the replayable-trajectory
    guarantee holds only when scoring rounds the margin at the same
    precision as training did."""
    z = _dot(F.col(feature_col), weights, bias, margin_decimals)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_decimals)
    return features.withColumn("score", score).withColumn(
        "keep", F.col("score") >= F.lit(threshold)
    )
