"""Checkpoint hub: name -> (architecture config, front-end config, release URL).

Mirrors the reference's pretrained-model registries
(models/mn/model.py:24-70, models/dymn/model.py:18-33): ~45 checkpoints on
GitHub releases, cached under ``resources/``. Here every name maps to a full
build recipe — model config AND the matching mel front-end config (the
reference leaves hop/mel variants to user flags; we encode them).

The torch ``.pt`` files are converted to native flax params by
``efficientat_tpu.models.convert``; conversion happens once at download time
and the converted ``.msgpack`` is cached next to the original.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

from efficientat_tpu.models.dymn import DyMN, DyMNConfig
from efficientat_tpu.models.mn import MN, MNConfig
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.utils.common import NAME_TO_WIDTH

RELEASE_URL = "https://github.com/fschmid56/EfficientAT/releases/download/v0.0.1/"
MODEL_DIR = "resources"


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    file: str  # filename on the release page
    model_cfg: Union[MNConfig, DyMNConfig]
    mel_cfg: MelConfig = MelConfig()

    @property
    def url(self) -> str:
        return RELEASE_URL + self.file


def _mn(name, file, *, width=None, head="mlp", strides=(2, 2, 2, 2), mel=None):
    width = NAME_TO_WIDTH(name) if width is None else width
    return ModelSpec(name, file,
                     MNConfig(width_mult=width, head_type=head, strides=tuple(strides)),
                     mel or MelConfig())


def _dymn(name, file, *, width=None, use_dy_blocks="all", t_max=1.0):
    """AudioSet-pretrained DyMN: final training temperature is 1.0; ImageNet
    checkpoints finished at 30.0 (models/dymn/model.py:336-340)."""
    width = NAME_TO_WIDTH(name) if width is None else width
    return ModelSpec(name, file,
                     DyMNConfig(width_mult=width, use_dy_blocks=use_dy_blocks,
                                t_max=t_max))


_SPECS = [
    # ImageNet-pretrained MN (1 input channel, AudioSet-ready head shapes)
    _mn("mn10_im_pytorch", "mn10_im_pytorch.pt"),
    _mn("mn01_im", "mn01_im.pt"),
    _mn("mn02_im", "mn02_im.pt"),
    _mn("mn04_im", "mn04_im.pt"),
    _mn("mn05_im", "mn05_im.pt"),
    _mn("mn10_im", "mn10_im.pt"),
    _mn("mn20_im", "mn20_im.pt"),
    _mn("mn30_im", "mn30_im.pt"),
    _mn("mn40_im", "mn40_im.pt"),
    # AudioSet-trained MN
    _mn("mn01_as", "mn01_as_mAP_298.pt"),
    _mn("mn02_as", "mn02_as_mAP_378.pt"),
    _mn("mn04_as", "mn04_as_mAP_432.pt"),
    _mn("mn05_as", "mn05_as_mAP_443.pt"),
    _mn("mn10_as", "mn10_as_mAP_471.pt"),
    _mn("mn20_as", "mn20_as_mAP_478.pt"),
    _mn("mn30_as", "mn30_as_mAP_482.pt"),
    _mn("mn40_as", "mn40_as_mAP_484.pt"),
    _mn("mn40_as(2)", "mn40_as_mAP_483.pt"),
    _mn("mn40_as(3)", "mn40_as_mAP_483(2).pt"),
    _mn("mn40_as_no_im_pre", "mn40_as_no_im_pre_mAP_483.pt"),
    _mn("mn40_as_no_im_pre(2)", "mn40_as_no_im_pre_mAP_483(2).pt"),
    _mn("mn40_as_no_im_pre(3)", "mn40_as_no_im_pre_mAP_482.pt"),
    _mn("mn40_as_ext", "mn40_as_ext_mAP_487.pt"),
    _mn("mn40_as_ext(2)", "mn40_as_ext_mAP_486.pt"),
    _mn("mn40_as_ext(3)", "mn40_as_ext_mAP_485.pt"),
    # hop-size variants (hop in ms at 32 kHz)
    _mn("mn10_as_hop_5", "mn10_as_hop_5_mAP_475.pt", mel=MelConfig(hopsize=160)),
    _mn("mn10_as_hop_15", "mn10_as_hop_15_mAP_463.pt", mel=MelConfig(hopsize=480)),
    _mn("mn10_as_hop_20", "mn10_as_hop_20_mAP_456.pt", mel=MelConfig(hopsize=640)),
    _mn("mn10_as_hop_25", "mn10_as_hop_25_mAP_447.pt", mel=MelConfig(hopsize=800)),
    # mel-band variants
    _mn("mn10_as_mels_40", "mn10_as_mels_40_mAP_453.pt", mel=MelConfig(n_mels=40)),
    _mn("mn10_as_mels_64", "mn10_as_mels_64_mAP_461.pt", mel=MelConfig(n_mels=64)),
    _mn("mn10_as_mels_256", "mn10_as_mels_256_mAP_474.pt", mel=MelConfig(n_mels=256)),
    # fully-convolutional heads (and stride variants)
    _mn("mn10_as_fc", "mn10_as_fc_mAP_465.pt", head="fully_convolutional"),
    _mn("mn10_as_fc_s2221", "mn10_as_fc_s2221_mAP_466.pt",
        head="fully_convolutional", strides=(2, 2, 2, 1)),
    _mn("mn10_as_fc_s2211", "mn10_as_fc_s2211_mAP_466.pt",
        head="fully_convolutional", strides=(2, 2, 1, 1)),
    # DyMN — ImageNet (final temperature 30)
    ModelSpec("dymn04_im", "dymn04_im.pt", DyMNConfig(width_mult=0.4, t_max=30.0)),
    ModelSpec("dymn10_im", "dymn10_im.pt", DyMNConfig(width_mult=1.0, t_max=30.0)),
    ModelSpec("dymn20_im", "dymn20_im.pt", DyMNConfig(width_mult=2.0, t_max=30.0)),
    # DyMN — AudioSet
    _dymn("dymn04_as", "dymn04_as.pt"),
    _dymn("dymn10_as", "dymn10_as.pt"),
    _dymn("dymn20_as", "dymn20_as_mAP_493.pt"),
    _dymn("dymn20_as(1)", "dymn20_as.pt"),
    _dymn("dymn20_as(2)", "dymn20_as_mAP_489.pt"),
    _dymn("dymn20_as(3)", "dymn20_as_mAP_490.pt"),
    _dymn("dymn04_replace_se_as", "dymn04_replace_se_as.pt", use_dy_blocks="replace_se"),
    # note: the reference registry has a stray leading space in this URL
    # (models/dymn/model.py:32) — fixed here.
    _dymn("dymn10_replace_se_as", "dymn10_replace_se_as.pt", use_dy_blocks="replace_se"),
]

REGISTRY = {s.name: s for s in _SPECS}


def get_model_config(name: str) -> ModelSpec:
    if name not in REGISTRY:
        raise KeyError(f"Model name '{name}' unknown. Known: {sorted(REGISTRY)}")
    return REGISTRY[name]


def build_model(name_or_cfg, num_classes: Optional[int] = None, dtype=None):
    """Build a flax module from a registry name or an explicit config.

    Returns (module, spec_or_None). ``num_classes`` overrides the config's
    class count (classifier-head surgery on load is handled by
    ``efficientat_tpu.models.convert.load_pretrained``).
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    spec = None
    if isinstance(name_or_cfg, str):
        spec = get_model_config(name_or_cfg)
        cfg = spec.model_cfg
    else:
        cfg = name_or_cfg
    if num_classes is not None and num_classes != cfg.num_classes:
        cfg = dataclasses.replace(cfg, num_classes=num_classes)
    if isinstance(cfg, DyMNConfig):
        return DyMN(cfg, dtype=dtype), spec
    return MN(cfg, dtype=dtype), spec
