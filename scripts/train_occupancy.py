"""Batch-training entry point — the engine's equivalent of the reference's
``ml/train_model.py``: occupancy CSV → class-weighted logistic regression
(or oversampled CV-tuned random forest) → metrics/curve/coefficient report
CSVs + a persisted PipelineModel.

Usage:
    python scripts/train_occupancy.py <data.csv> <out_dir> [lr|rf] [--no-light]

``--no-light`` drops the Light feature (leakage: ~0.91 corr with the
label, the reference's `occupancy_no_light` variant).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_occupancy_detection_spark.ml.evaluation import evaluate_classifier
from big_data_occupancy_detection_spark.ml.pipelines import (
    SEED,
    build_rf_cv_pipeline,
    build_weighted_lr_pipeline,
    oversample_minority,
    strip_training_summary,
)
from big_data_occupancy_detection_spark.ml.reports import export_classifier_reports
from big_data_occupancy_detection_spark.operators.relational import class_weights
from big_data_occupancy_detection_spark.session import get_local_session
from big_data_occupancy_detection_spark.sources.readers import read_csv_inferred

ALL_FEATURES = ["Temperature", "Humidity", "Light", "CO2", "HumidityRatio"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 2:
        sys.exit("usage: train_occupancy.py <data.csv> <out_dir> [lr|rf] [--no-light]")
    data_path, out_dir = args[0], args[1]
    algo = args[2] if len(args) > 2 else "lr"
    features = [
        f
        for f in ALL_FEATURES
        if not (f == "Light" and "--no-light" in sys.argv)
    ]

    spark = get_local_session("occupancy-train")
    spark.sparkContext.setLogLevel("ERROR")
    # Column layout at split time matters: randomSplit sorts each partition by
    # ALL columns for determinism, so reproducing the reference's seed-42 split
    # (ml/train_model.py:131-132,347) requires the same leading column order —
    # `id` first (unique, so it alone fixes the total order), Occupancy cast
    # then RENAMED (not duplicated), weight column appended last, and no extra
    # derived columns before the split.
    df = (
        read_csv_inferred(spark, data_path)
        .withColumn("Occupancy", F.col("Occupancy").cast("int"))
        .withColumnRenamed("Occupancy", "label")
        .na.drop(subset=features + ["label"])
    )

    if algo == "lr":
        cols = df.columns
        weighted = class_weights(df, "label", num_classes=2).select(
            *cols, "class_weight"
        )
        train, test = weighted.randomSplit([0.7, 0.3], seed=SEED)
        model = build_weighted_lr_pipeline(features).fit(train)
    elif algo == "rf":
        train, test = df.randomSplit([0.8, 0.2], seed=SEED)
        cv = build_rf_cv_pipeline(features)
        model = cv.fit(oversample_minority(train, "label", minority=1)).bestModel
    else:
        sys.exit(f"unknown algo {algo!r} (want lr|rf)")

    for prefix, split in (("train", train), ("test", test)):
        preds = model.transform(split)
        metrics = evaluate_classifier(preds)
        print(f"{prefix}: " + ", ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
        export_classifier_reports(model, preds, out_dir, prefix=prefix)

    # Summaries feed the reports above; strip before the model leaves this
    # scope so downstream sessions can score it after any observe() use
    # (see ml.pipelines.strip_training_summary).
    strip_training_summary(model)
    model_dir = os.path.join(out_dir, f"occupancy_{algo}")
    model.write().overwrite().save(model_dir)
    print(f"model saved to {model_dir}; reports in {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
