"""Follow-up measurements for rf_selection.json (round-7):

1. Fit the pipeline at EXACTLY the reference's saved winner params
   (numTrees=200, maxDepth=25, subsamplingRate=0.8, RF seed = the
   recorded 3543767574895324818) on the balanced train split and record
   its test AUC/accuracy — the apples-to-apples comparison against the
   notebook's published "Test AUC: 0.9975 / Test Accuracy: 0.9783".
2. Re-run the full 24-config 3-fold CV at two MORE fold seeds and record
   each argmax — quantifying that the grid's top cluster is separated by
   ~6e-05 avg-AUC (fold-assignment noise), i.e. the reference's winner
   identity is not recoverable without its unrecorded CV fold seed.

Merges results into /root/repo/rf_selection.json.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

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
REF_RF_SEED = 3543767574895324818
FEATURES = ["Temperature", "Humidity", "CO2", "HumidityRatio"]
ART = "/root/repo/rf_selection.json"

spark = get_local_session("rf-selection-followup")
spark.sparkContext.setLogLevel("ERROR")

df = spark.read.csv(DATA, header=True, inferSchema=True)
train_df, test_df = df.randomSplit([0.8, 0.2], seed=42)
major_df = train_df.filter(F.col("Occupancy") == 0)
minor_df = train_df.filter(F.col("Occupancy") == 1)
ratio = major_df.count() / minor_df.count()
train_balanced = major_df.unionAll(
    minor_df.sample(withReplacement=True, fraction=ratio, seed=42)
)

assembler = VectorAssembler(inputCols=FEATURES, outputCol="features_raw")
scaler = StandardScaler(
    inputCol="features_raw", outputCol="features", withStd=True, withMean=True
)

# 1. the reference's exact saved params
rf_ref = RandomForestClassifier(
    labelCol="Occupancy",
    featuresCol="features",
    seed=REF_RF_SEED,
    numTrees=200,
    maxDepth=25,
    subsamplingRate=0.8,
)
model = Pipeline(stages=[assembler, scaler, rf_ref]).fit(train_balanced)
preds = model.transform(test_df)
ref_auc = BinaryClassificationEvaluator(
    labelCol="Occupancy", metricName="areaUnderROC"
).evaluate(preds)
ref_acc = MulticlassClassificationEvaluator(
    labelCol="Occupancy", metricName="accuracy"
).evaluate(preds)
print(json.dumps({"ref_param_test_auc": ref_auc, "ref_param_test_acc": ref_acc}))

# 2. CV argmax at two more fold seeds
winners = {}
for fold_seed in (7, 123):
    rf = RandomForestClassifier(
        labelCol="Occupancy", featuresCol="features", seed=REF_RF_SEED
    )
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, [50, 100, 200])
        .addGrid(rf.maxDepth, [10, 15, 20, 25])
        .addGrid(rf.subsamplingRate, [0.8, 1.0])
        .build()
    )
    cv = CrossValidator(
        estimator=Pipeline(stages=[assembler, scaler, rf]),
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(labelCol="Occupancy"),
        numFolds=3,
        seed=fold_seed,
        parallelism=8,
    )
    m = cv.fit(train_balanced)
    scored = sorted(
        (
            {
                "numTrees": pm[rf.numTrees],
                "maxDepth": pm[rf.maxDepth],
                "subsamplingRate": pm[rf.subsamplingRate],
                "avg_auc": auc,
            }
            for pm, auc in zip(grid, m.avgMetrics)
        ),
        key=lambda r: -r["avg_auc"],
    )
    winners[str(fold_seed)] = {
        "winner": {
            k: scored[0][k] for k in ("numTrees", "maxDepth", "subsamplingRate")
        },
        "winner_avg_auc": scored[0]["avg_auc"],
        "ref_params_rank": 1
        + next(
            i
            for i, r in enumerate(scored)
            if (r["numTrees"], r["maxDepth"], r["subsamplingRate"])
            == (200, 25, 0.8)
        ),
        "ref_params_delta_to_winner": scored[0]["avg_auc"]
        - next(
            r["avg_auc"]
            for r in scored
            if (r["numTrees"], r["maxDepth"], r["subsamplingRate"])
            == (200, 25, 0.8)
        ),
        "top5": scored[:5],
    }
    print(json.dumps({fold_seed: winners[str(fold_seed)]["winner"]}))

art = json.load(open(ART))
art["ref_param_test_auc"] = ref_auc
art["ref_param_test_accuracy"] = ref_acc
art["published_notebook_outputs"] = {
    "oversampling_ratio": "3.34",
    "test_auc": "0.9975",
    "test_accuracy": "0.9783",
}
art["winner_by_fold_seed"] = winners
with open(ART, "w") as fh:
    json.dump(art, fh, indent=1, sort_keys=True)
print("merged into", ART)
spark.stop()
