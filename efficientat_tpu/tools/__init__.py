from efficientat_tpu.tools.layer_plan import LayerInfo, layer_plan
from efficientat_tpu.tools.macs import count_macs, count_params
from efficientat_tpu.tools.peak_memory import peak_memory_cnn, peak_memory_mnv3
from efficientat_tpu.tools.receptive_field import receptive_field

__all__ = [
    "LayerInfo",
    "layer_plan",
    "count_macs",
    "count_params",
    "peak_memory_cnn",
    "peak_memory_mnv3",
    "receptive_field",
]
