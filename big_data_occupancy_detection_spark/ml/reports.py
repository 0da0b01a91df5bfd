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
    """Write metrics, confusion-matrix, and (for LR) ROC/PR/coefficient
    CSVs, plus PNG renderings of the confusion matrix and ROC/PR curves.

    Returns {artifact_name: path}. Mirrors the reference's report layout
    (``ml/reports/metrics_test.csv`` + matplotlib PNGs,
    ``ml/train_model.py:56-101,318-334``) so its quality gates can be
    re-checked file-for-file; PNGs here come from the stdlib raster
    renderer (ml/plotting.py) since matplotlib is not installable.
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

    # PNG twin of the reference's matplotlib heatmap (train_model.py:56-101),
    # rendered with the stdlib raster + PNG encoder (no matplotlib here)
    from .plotting import confusion_matrix_png

    cells = {
        (int(r["label"]), int(r["prediction"])): int(r["n"]) for _, r in cm.iterrows()
    }
    cm_png = os.path.join(out_dir, f"confusion_matrix_{prefix}.png")
    with open(cm_png, "wb") as f:
        f.write(confusion_matrix_png(cells))
    paths["confusion_matrix_png"] = cm_png

    clf = model.stages[-1]
    summary = clf.summary if getattr(clf, "hasSummary", False) else None
    if summary is not None and hasattr(summary, "roc"):
        from .plotting import line_chart_png

        roc = summary.roc.toPandas()
        roc_path = os.path.join(out_dir, f"lr_roc_{prefix}.csv")
        roc.to_csv(roc_path, index=False)
        paths["roc"] = roc_path
        roc_png = os.path.join(out_dir, f"lr_roc_{prefix}.png")
        with open(roc_png, "wb") as f:
            f.write(line_chart_png(list(zip(roc["FPR"], roc["TPR"])), diagonal=True))
        paths["roc_png"] = roc_png

        pr = summary.pr.toPandas()
        pr_path = os.path.join(out_dir, f"lr_pr_{prefix}.csv")
        pr.to_csv(pr_path, index=False)
        paths["pr"] = pr_path
        pr_png = os.path.join(out_dir, f"lr_pr_{prefix}.png")
        with open(pr_png, "wb") as f:
            f.write(line_chart_png(list(zip(pr["recall"], pr["precision"]))))
        paths["pr_png"] = pr_png
    if hasattr(clf, "coefficients"):
        coef_path = os.path.join(out_dir, f"lr_coefficients_{prefix}.csv")
        with open(coef_path, "w") as f:
            f.write("feature_index,coefficient\n")
            for i, c in enumerate(clf.coefficients):
                f.write(f"{i},{c}\n")
            f.write(f"intercept,{clf.intercept}\n")
        paths["coefficients"] = coef_path
    return paths
