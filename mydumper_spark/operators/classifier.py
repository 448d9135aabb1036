"""ML-assisted quality curation: distill the rule-based gates into a
trained linear classifier over feature-hashed text (the FineWeb-Edu
pattern: expensive/handcrafted judgments train a cheap model that scores
the whole corpus).

Spark-first split, same shape as the trained PQ/BPE artifacts:

- **Training is a bounded MLlib job** — logistic regression over the
  feature-hashed embeddings of a (optionally sampled) labeled frame.
  MLlib's LBFGS is already distributed; the fitted artifact is just
  (coefficients, intercept) — ``dim + 1`` doubles.
- **Inference is pure codegen** — the coefficients inline into a Column
  expression (``sigmoid(Σ cᵢ·xᵢ + b)`` via ``F.aggregate``), so corpus
  scoring is a scan-side map with NO MLlib, no Python, no shuffle. At
  100 TB the model rides in the plan like the IVF centroids do.

Determinism: feature hashing is deterministic; LBFGS on a fixed frame is
deterministic up to float reduction order — the *artifact* is recorded
(coefficients in the return value), so scoring is exactly reproducible
from the artifact even if refitting jitters in the last ulp.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LinearQualityModel:
    """The portable artifact: score = sigmoid(coefficients · x + intercept)
    over the ``dim``-wide feature-hash embedding."""

    dim: int
    intercept: float
    coefficients: list[float] = field(default_factory=list)


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> LinearQualityModel:
    """Fit logistic regression on feature-hashed text. ``labeled`` carries
    (id, text, label∈{0,1}) — labels typically come from a rule gate
    (gopher_pass), a human sample, or an upstream LLM judge. Returns the
    inline-able artifact, never the MLlib model object."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from mydumper_spark.operators.similarity import feature_hash_embedding

    feats = feature_hash_embedding(
        labeled, text_col=text_col, id_col=id_col, dim=dim
    ).join(labeled.select(id_col, label_col), id_col)
    train = feats.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("features"),
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param)
    m = lr.fit(train)
    return LinearQualityModel(
        dim=dim,
        intercept=float(m.intercept),
        coefficients=[float(c) for c in m.coefficients],
    )


def quality_score_expr(model: LinearQualityModel, emb_col: Column) -> Column:
    """sigmoid(c·x + b) as a pure Column fold over the embedding array —
    the coefficients constant-fold into the plan (IVF-centroid pattern):
    corpus scoring is whole-stage codegen, zero Python, zero shuffle."""
    coef = F.array(*[F.lit(c) for c in model.coefficients])
    dot = F.aggregate(
        F.zip_with(emb_col, coef, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    z = dot + F.lit(model.intercept)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame,
    model: LinearQualityModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
) -> DataFrame:
    """Score (and optionally gate) a corpus with a trained model: feature
    hashing + the inlined linear expression. Returns (id, quality_prob
    [, quality_pass])."""
    from mydumper_spark.operators.similarity import feature_hash_embedding

    emb = feature_hash_embedding(df, text_col=text_col, id_col=id_col,
                                 dim=model.dim)
    out = emb.select(
        F.col(id_col),
        quality_score_expr(model, F.col("embedding")).alias("quality_prob"),
    )
    if threshold is not None:
        out = out.withColumn(
            "quality_pass",
            (F.col("quality_prob") >= threshold).cast("int"))
    return out
