"""Distributed logistic regression (full-batch gradient descent),
bit-deterministic — the companion to operators/kmeans: iterative ML
whose every step is hash-checkable against a SQL oracle.

Per iteration: ONE aggregate pass computes every weight's gradient
(map-side combined partial sums — the classic Spark GD shape, d+1
doubles of driver state). Determinism contract:

- the sigmoid is quantized: p = ROUND(1/(1+exp(-z)), ndigits).
  ``exp`` is not correctly rounded across engines (measured: ~10% of
  values differ by 1 ulp between Java and DuckDB), but the 1-ulp
  noise sits ~1e-16 below the quantization step, so the ROUND
  collapses both engines to identical doubles (measured 0 diffs in
  50k samples);
- per-row gradient contributions ROUND to ``ndigits`` then sum as
  exact DECIMAL — order-independent across partitionings;
- weight updates round to ``ndigits`` INSIDE the same Spark
  aggregate (engine ROUND is half-away-from-zero; Python's round()
  is banker's and would drift).

At 100 TB: cache the projected feature frame once; each iteration
is a scan + one tiny shuffle of partial sums. Feature values should
be pre-scaled to O(1) so ``ndigits`` quantization is a relative
error of ~1e-6 (standard feature-scaling practice anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(feature_cols: list[str], w: list[float]) -> Column:
    z = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(w[j + 1])) * F.col(c)
    return z


def sigmoid(z: Column, ndigits: int = 6) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), ndigits)


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iter: int = 3,
    lr: float = 1.0,
    ndigits: int = 6,
) -> list[float]:
    """Fit by ``n_iter`` full-batch GD steps from w = 0; returns
    [bias, w_1, ..., w_d]. Label must be 0/1."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    y = F.col(label_col).cast("double")
    for _ in range(n_iter):
        resid = sigmoid(_z(feature_cols, w), ndigits) - y
        terms = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
        aggs = []
        for j, t in enumerate(terms):
            g = F.round(
                F.sum(
                    F.round(resid * t, ndigits).cast(f"decimal(28,{ndigits})")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                ndigits,
            )
            aggs.append(
                F.round(F.lit(float(w[j])) - F.lit(float(lr)) * g, ndigits)
                .alias(f"w{j}")
            )
        row = df.agg(*aggs).collect()[0]
        w = [float(row[f"w{j}"]) for j in range(d + 1)]
    return w


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    prob_col: str = "prob",
    ndigits: int = 6,
) -> DataFrame:
    """Append the quantized predicted probability — a pure map-side
    expression (codegen-fused, no shuffle)."""
    return df.withColumn(
        prob_col, sigmoid(_z(feature_cols, weights), ndigits)
    )
