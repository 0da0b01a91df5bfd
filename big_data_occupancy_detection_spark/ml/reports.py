"""Training report exports — SURVEY.md §2.1 S7 + §2.10 M10.

The reference persists model-quality artifacts as driver-side CSVs
(``ml/train_model.py:56-101,257-334``): metrics, confusion matrix, LR
ROC/PR curves and standardized coefficients. Reproduced here as explicit
driver-edge utilities: everything distributed stays a DataFrame until the
final tiny result crosses to pandas (Arrow transfer), which is the correct
shape at any scale — curves and matrices are O(thresholds) and O(classes²),
never O(rows).
"""

from __future__ import annotations

import os

from pyspark.ml import PipelineModel

from .evaluation import confusion_matrix, evaluate_classifier


def export_classifier_reports(
    model: PipelineModel,
    predictions,
    out_dir: str,
    prefix: str = "test",
) -> dict[str, str]:
    """Write metrics, confusion-matrix, and (for LR) ROC/PR/coefficient CSVs.

    Returns {artifact_name: path}. Mirrors the reference's report layout
    (``ml/reports/metrics_test.csv`` etc.) so its quality gates can be
    re-checked file-for-file.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}

    metrics = evaluate_classifier(predictions)
    mpath = os.path.join(out_dir, f"metrics_{prefix}.csv")
    with open(mpath, "w") as f:
        cols = sorted(metrics)
        f.write(",".join(cols) + "\n")
        f.write(",".join(str(metrics[c]) for c in cols) + "\n")
    paths["metrics"] = mpath

    cm = confusion_matrix(predictions).toPandas()
    cpath = os.path.join(out_dir, f"confusion_matrix_{prefix}.csv")
    cm.sort_values(["label", "prediction"]).to_csv(cpath, index=False)
    paths["confusion_matrix"] = cpath

    clf = model.stages[-1]
    summary = clf.summary if getattr(clf, "hasSummary", False) else None
    if summary is not None and hasattr(summary, "roc"):
        roc_path = os.path.join(out_dir, f"lr_roc_{prefix}.csv")
        summary.roc.toPandas().to_csv(roc_path, index=False)
        paths["roc"] = roc_path
        pr_path = os.path.join(out_dir, f"lr_pr_{prefix}.csv")
        summary.pr.toPandas().to_csv(pr_path, index=False)
        paths["pr"] = pr_path
    if hasattr(clf, "coefficients"):
        coef_path = os.path.join(out_dir, f"lr_coefficients_{prefix}.csv")
        with open(coef_path, "w") as f:
            f.write("feature_index,coefficient\n")
            for i, c in enumerate(clf.coefficients):
                f.write(f"{i},{c}\n")
            f.write(f"intercept,{clf.intercept}\n")
        paths["coefficients"] = coef_path
    return paths
