"""Learned quality classification for training-data curation.

The hand-thresholded Gopher gate (functions/text.py:gopher_passes) has a
learned counterpart in every modern corpus pipeline: GPT-3 trained a
logistic-regression quality filter over Common Crawl (Brown et al. 2020,
Appendix A), and DataComp-LM (Li et al. 2024) showed learned linear
filters dominating hand rules. This module is that component, designed
Spark-first in two asymmetric halves:

- **Training runs on the cluster**: features are the SAME pure-column
  Gopher metric expressions the rule gate uses (one shared builder —
  functions/text.py:_gopher_metric_cols — so the learned and hand gates
  see identical inputs), assembled and fit with MLlib's distributed
  LBFGS. Driver-side state is |features| + 1 doubles.
- **Serving runs as a PURE COLUMN EXPRESSION**: the fitted weights fold
  into ``sigmoid(w·x + b)`` over the metric columns, so the inference
  path carries no MLlib, no model object, no UDF — it rides the scan
  exactly like ``gopher_passes``, and the model itself is a plain JSON
  dict you stage to the lake next to the corpus it filters.

Float caveat (why this is rows-only, not oracle-gated): LBFGS iterates
over float partial aggregates, so fitted coefficients are reproducible
for a fixed (data, partitioning, params) but not bit-pinned across BLAS
builds — the class shared with embedding_pca. The serving expression IS
deterministic given a model dict.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature order — FIXED: the model dict records it, and serving folds
#: coefficients positionally against these metric columns.
QUALITY_FEATURES: tuple[str, ...] = (
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "stop_hits",
)


def quality_feature_cols(text: Column) -> dict[str, Column]:
    """The classifier's feature columns: the shared Gopher metric builder
    with NULLs (degenerate zero-word docs) coalesced to 0.0 and every
    feature cast to double — narrow, rides the scan."""
    from chess_lakehouse_spark.functions.text import _gopher_metric_cols

    metrics = _gopher_metric_cols(text)
    return {
        name: F.coalesce(metrics[name].cast("double"), F.lit(0.0))
        for name in QUALITY_FEATURES
    }


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, <QUALITY_FEATURES...>) projection."""
    cols = quality_feature_cols(F.col(text_col))
    return df.select(F.col(id_col), *[cols[n].alias(n) for n in QUALITY_FEATURES])


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    max_iter: int = 100,
    reg_param: float = 0.01,
) -> dict:
    """Fit the LR quality filter on labeled documents (label 1 = keep).

    Returns a PLAIN DICT — ``{"features": [...], "coef": {name: w},
    "intercept": b}`` — not an MLlib model: JSON-serializable for the
    lake, and exactly what :func:`classifier_score` folds into a column
    expression. MLlib fits on standardized features but reports
    coefficients on the original scale, so the raw dot product serves
    correctly."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(df, id_col, text_col).join(
        df.select(id_col, F.col(label_col).cast("double").alias("_label")), id_col
    )
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="_fv"
    ).transform(feats)
    model = LogisticRegression(
        featuresCol="_fv", labelCol="_label", maxIter=max_iter, regParam=reg_param
    ).fit(assembled)
    coef = dict(zip(QUALITY_FEATURES, (float(c) for c in model.coefficients)))
    return {
        "features": list(QUALITY_FEATURES),
        "coef": coef,
        "intercept": float(model.intercept),
    }


def classifier_margin(text: Column, model: dict) -> Column:
    """The linear margin ``z = w·x + b`` over the metric columns —
    pure double arithmetic folded left-to-right in ``model["features"]``
    order, so a SQL mirror with the same literals and association is
    bit-identical cross-engine (the sigmoid is monotone in z, so gate
    decisions derived from ``z >= logit(threshold)`` avoid the
    transcendental entirely)."""
    cols = quality_feature_cols(text)
    z = F.lit(float(model["intercept"]))
    for name in model["features"]:
        z = z + F.lit(float(model["coef"][name])) * cols[name]
    return z


def classifier_score(text: Column, model: dict) -> Column:
    """``sigmoid(w·x + b)`` over the metric columns as one pure column
    expression — the learned gate's serving path, zero MLlib/UDF."""
    z = classifier_margin(text, model)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    threshold: float | None = None,
) -> DataFrame:
    """(id, keep_prob) for every document — or, with ``threshold``, the
    filtered documents themselves (the gate form, same shape as the
    Gopher/score gates in the clean-corpus pipeline)."""
    prob = classifier_score(F.col(text_col), model)
    if threshold is None:
        return df.select(F.col(id_col), prob.alias("keep_prob"))
    return df.where(prob >= F.lit(float(threshold)))


def reference_sigmoid(features: dict[str, float], model: dict) -> float:
    """Pure-Python twin of :func:`classifier_score` for tests."""
    z = model["intercept"] + sum(
        model["coef"][n] * features[n] for n in model["features"]
    )
    return 1.0 / (1.0 + math.exp(-z))
