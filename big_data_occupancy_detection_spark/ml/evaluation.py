"""Model evaluation + report writing (SURVEY.md §2.10 M9/M10).

Metrics mirror the reference's report surface
(``ml/train_model.py:207-272``): accuracy / weighted F1 / weighted
precision / weighted recall plus a confusion-matrix DataFrame. Reports can
be persisted as single-file CSVs via ``sources.sinks.write_single_csv``
(golden-file comparisons use tolerances, not exact equality — LBFGS/forest
training is floating-point-iteration sensitive even when seeded).
"""

from __future__ import annotations

from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_classifier(
    predictions: DataFrame, label_col: str = "label"
) -> dict[str, float]:
    out = {}
    for metric in ("accuracy", "f1", "weightedPrecision", "weightedRecall"):
        ev = MulticlassClassificationEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName=metric
        )
        out[metric] = ev.evaluate(predictions)
    return out


def confusion_matrix(predictions: DataFrame, label_col: str = "label") -> DataFrame:
    return (
        predictions.groupBy(
            F.col(label_col).cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )
