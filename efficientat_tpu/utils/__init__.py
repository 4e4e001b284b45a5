from efficientat_tpu.utils.common import (
    NAME_TO_WIDTH,
    cnn_out_size,
    make_divisible,
)
from efficientat_tpu.utils.labels import AUDIOSET_LABELS, AUDIOSET_IDS

__all__ = [
    "NAME_TO_WIDTH",
    "cnn_out_size",
    "make_divisible",
    "AUDIOSET_LABELS",
    "AUDIOSET_IDS",
]
