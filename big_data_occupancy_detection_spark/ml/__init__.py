from .pipelines import (
    build_rf_cv_pipeline,
    build_weighted_lr_pipeline,
    oversample_minority,
)
from .evaluation import confusion_matrix, evaluate_classifier

__all__ = [
    "build_weighted_lr_pipeline",
    "build_rf_cv_pipeline",
    "oversample_minority",
    "evaluate_classifier",
    "confusion_matrix",
]
