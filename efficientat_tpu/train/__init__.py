from efficientat_tpu.train.schedules import exp_warmup_linear_down, per_epoch_schedule
from efficientat_tpu.train.augment import mixup_coefficients, apply_mixup, mixstyle
from efficientat_tpu.train.metrics import average_precision, roc_auc, macro_metrics

__all__ = [
    "exp_warmup_linear_down",
    "per_epoch_schedule",
    "mixup_coefficients",
    "apply_mixup",
    "mixstyle",
    "average_precision",
    "roc_auc",
    "macro_metrics",
]
