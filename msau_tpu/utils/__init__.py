from msau_tpu.utils.metrics import (
    classification_report,
    confusion_matrix,
    micro_metrics,
)

__all__ = ["micro_metrics", "classification_report", "confusion_matrix"]
