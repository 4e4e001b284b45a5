from efficientat_tpu.models.mn import MN, MNConfig, mn_block_table
from efficientat_tpu.models.dymn import DyMN, DyMNConfig
from efficientat_tpu.models.ensemble import Ensemble
from efficientat_tpu.models.registry import build_model, get_model_config

__all__ = [
    "MN",
    "MNConfig",
    "mn_block_table",
    "DyMN",
    "DyMNConfig",
    "Ensemble",
    "build_model",
    "get_model_config",
]
