"""Reproduce the reference's RF/no-light CV model selection on its real
dataset — the last reference artifact never replayed end-to-end.

The reference's saved model pins the 3x4x2-grid CV winner at
numTrees=200 / maxDepth=25 / subsamplingRate=0.8
(/root/reference/ml/models/occupancy_no_light/stages/
2_RandomForestClassifier_490d3ce7d299/metadata/part-00000-*.txt), selected
by ml/model_creation_and_tuning.ipynb (cells 4-18): inferred CSV scan of
ml/dataset/occupancy_all.csv → randomSplit([0.8, 0.2], seed=42) on the
AS-READ column layout (no casts/renames before the split — randomSplit
sorts each partition by ALL columns, so layout IS the split) → minority
oversampling (fraction = major/minor, seed 42, unionAll) → VectorAssembler
(4 features, Light excluded) → StandardScaler(withMean=True) →
RandomForestClassifier(labelCol="Occupancy") → ParamGrid
[50,100,200]x[10,15,20,25]x[0.8,1.0] × 3-fold CrossValidator on
BinaryClassificationEvaluator(areaUnderROC).

Seed provenance: the notebook left rf/cv seeds at PySpark defaults
(hash(type(self).__name__) — salted per process, unrecoverable), but the
saved metadata RECORDS the RF seed its run happened to use:
defaultParamMap.seed = 3543767574895324818. This script pins exactly
that. The CrossValidator fold seed was never recorded (the CV model was
not saved); folds here use seed 42 — so avgMetrics are fold-seed-specific
while the ARGMAX is the reproduction target, asserted by
tests/test_rf_selection.py over the committed artifact.

Usage: python scripts/reproduce_rf_selection.py [out_json]
Writes the full 24-row grid (params + avgAUC), the winner, and test
AUC/accuracy of the winning model. Expensive (72 RF fits + refit);
run once per round and commit the artifact (rf_selection.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml import Pipeline
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.session import get_local_session

DATA = "/root/reference/ml/dataset/occupancy_all.csv"
# the reference run's recorded RF seed (saved model defaultParamMap.seed)
REF_RF_SEED = 3543767574895324818
FEATURES = ["Temperature", "Humidity", "CO2", "HumidityRatio"]


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/rf_selection.json"
    spark = get_local_session("rf-selection-parity")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.csv(DATA, header=True, inferSchema=True)
    train_df, test_df = df.randomSplit([0.8, 0.2], seed=42)

    major_df = train_df.filter(F.col("Occupancy") == 0)
    minor_df = train_df.filter(F.col("Occupancy") == 1)
    ratio = major_df.count() / minor_df.count()
    minor_oversampled = minor_df.sample(
        withReplacement=True, fraction=ratio, seed=42
    )
    train_balanced = major_df.unionAll(minor_oversampled)

    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features_raw")
    scaler = StandardScaler(
        inputCol="features_raw", outputCol="features", withStd=True, withMean=True
    )
    rf = RandomForestClassifier(
        labelCol="Occupancy", featuresCol="features", seed=REF_RF_SEED
    )
    pipeline = Pipeline(stages=[assembler, scaler, rf])
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, [50, 100, 200])
        .addGrid(rf.maxDepth, [10, 15, 20, 25])
        .addGrid(rf.subsamplingRate, [0.8, 1.0])
        .build()
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol="Occupancy"),
        numFolds=3,
        seed=42,  # fold seed unrecorded by the reference; pinned for reruns
        parallelism=8,
    )
    t0 = time.time()
    cv_model = cv.fit(train_balanced)
    fit_wall = time.time() - t0

    rows = []
    for pm, auc in zip(grid, cv_model.avgMetrics):
        rows.append(
            {
                "numTrees": pm[rf.numTrees],
                "maxDepth": pm[rf.maxDepth],
                "subsamplingRate": pm[rf.subsamplingRate],
                "avg_auc": auc,
            }
        )
    winner = max(rows, key=lambda r: r["avg_auc"])

    best = cv_model.bestModel
    best_rf = best.stages[-1]
    preds = best.transform(test_df)
    test_auc = BinaryClassificationEvaluator(
        labelCol="Occupancy", metricName="areaUnderROC"
    ).evaluate(preds)
    test_acc = MulticlassClassificationEvaluator(
        labelCol="Occupancy", metricName="accuracy"
    ).evaluate(preds)

    artifact = {
        "data": DATA,
        "rf_seed": REF_RF_SEED,
        "cv_fold_seed": 42,
        "spark_version": spark.version,
        "n_train": train_df.count(),
        "n_test": test_df.count(),
        "n_train_balanced": train_balanced.count(),
        "oversample_ratio": ratio,
        "grid": rows,
        "winner": {k: winner[k] for k in ("numTrees", "maxDepth", "subsamplingRate")},
        "winner_avg_auc": winner["avg_auc"],
        "best_model_params": {
            "numTrees": best_rf.getNumTrees,
            "maxDepth": best_rf.getMaxDepth(),
            "subsamplingRate": best_rf.getSubsamplingRate(),
        },
        "reference_saved_params": {
            "numTrees": 200,
            "maxDepth": 25,
            "subsamplingRate": 0.8,
        },
        "test_auc": test_auc,
        "test_accuracy": test_acc,
        "feature_importances": dict(
            zip(FEATURES, best_rf.featureImportances.toArray().tolist())
        ),
        "fit_wall_sec": fit_wall,
    }
    with open(out_json, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in (
        "winner", "winner_avg_auc", "test_auc", "test_accuracy", "fit_wall_sec"
    )}))
    spark.stop()


if __name__ == "__main__":
    main()
