"""MN — MobileNetV3-Large audio tagger, flax.linen, NHWC.

Architecture parity with the reference (models/mn/model.py:73-271):
stem conv k3 s2 -> 15 inverted-residual blocks (table below) -> 1x1 conv to
6x the last block's channels -> one of three heads (mlp / fully_convolutional
/ multihead_attention_pooling). Forward returns ``(logits, embedding)`` where
the embedding is the global-avg-pooled final feature map
(models/mn/model.py:212-231).

Input here is NHWC: (B, F, T, 1) log-mel spectrograms.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from efficientat_tpu.models.layers import (
    BlockConfig,
    ConvNormAct,
    FullyConvHead,
    InvertedResidual,
    MlpHead,
    MultiHeadAttentionPooling,
    conv_out_count,
    masked_time_mean,
    time_mask,
)
from efficientat_tpu.utils.common import cnn_out_size, make_divisible


def mn_block_table(
    width_mult: float = 1.0,
    reduced_tail: bool = False,
    dilated: bool = False,
    strides: Tuple[int, int, int, int] = (2, 2, 2, 2),
) -> Tuple[List[BlockConfig], int]:
    """The 15-row MobileNetV3-Large table (models/mn/model.py:237-271).

    Returns (block configs, last_channel for the mlp head).
    """
    rd = 2 if reduced_tail else 1
    dil = 2 if dilated else 1
    row = lambda *a: BlockConfig.make(*a, width_mult=width_mult)
    table = [
        # in, k, exp, out, se, act, stride, dilation
        row(16, 3, 16, 16, False, "RE", 1, 1),
        row(16, 3, 64, 24, False, "RE", strides[0], 1),   # C1
        row(24, 3, 72, 24, False, "RE", 1, 1),
        row(24, 5, 72, 40, True, "RE", strides[1], 1),    # C2
        row(40, 5, 120, 40, True, "RE", 1, 1),
        row(40, 5, 120, 40, True, "RE", 1, 1),
        row(40, 3, 240, 80, False, "HS", strides[2], 1),  # C3
        row(80, 3, 200, 80, False, "HS", 1, 1),
        row(80, 3, 184, 80, False, "HS", 1, 1),
        row(80, 3, 184, 80, False, "HS", 1, 1),
        row(80, 3, 480, 112, True, "HS", 1, 1),
        row(112, 3, 672, 112, True, "HS", 1, 1),
        row(112, 5, 672, 160 // rd, True, "HS", strides[3], dil),  # C4
        row(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
        row(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
    ]
    last_channel = make_divisible(1280 // rd * width_mult, 8)
    return table, last_channel


@dataclasses.dataclass(frozen=True)
class MNConfig:
    """Constructor surface of the reference ``get_model`` (models/mn/model.py:326-367)."""

    num_classes: int = 527
    width_mult: float = 1.0
    reduced_tail: bool = False
    dilated: bool = False
    strides: Tuple[int, int, int, int] = (2, 2, 2, 2)
    head_type: str = "mlp"  # mlp | fully_convolutional | multihead_attention_pooling
    multihead_attention_heads: int = 4
    input_dim_f: int = 128
    input_dim_t: int = 1000
    se_dims: str = "c"  # subset of "cft", or "none"
    se_agg: str = "max"
    se_r: int = 4
    in_conv_kernel: int = 3
    in_conv_stride: int = 2
    in_channels: int = 1
    dropout: float = 0.2
    # rematerialize each block's activations in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for O(depth) less activation
    # memory — lets the big widths train at large batch on one chip
    remat: bool = False

    def block_table(self):
        return mn_block_table(self.width_mult, self.reduced_tail, self.dilated,
                              self.strides)

    def feature_map_sizes(self) -> List[Tuple[int, int]]:
        """(f, t) after each block, used to size f/t SE layers
        (reference tracks these for the same purpose, models/mn/model.py:144-151)."""
        table, _ = self.block_table()
        f = cnn_out_size(self.input_dim_f, 1, 1, self.in_conv_kernel, self.in_conv_stride)
        t = cnn_out_size(self.input_dim_t, 1, 1, self.in_conv_kernel, self.in_conv_stride)
        sizes = []
        for cnf in table:
            f, t = cnf.out_size(f), cnf.out_size(t)
            sizes.append((f, t))
        return sizes


class MN(nn.Module):
    cfg: MNConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, time_valid=None):
        """x: (B, F, T, C_in) -> (logits (B, classes), embedding (B, C_feat)).

        ``time_valid`` (B,): number of valid INPUT mel frames per sample;
        enables bucket-padded variable-length evaluation. Padded frames are
        re-zeroed before every time-mixing op and excluded from every
        time-reducing mean, so the masked forward equals an exact-shape
        forward on the first ``time_valid[b]`` frames (to fp rounding)."""
        cfg = self.cfg
        table, last_channel = cfg.block_table()
        fm_sizes = cfg.feature_map_sizes()
        se_dims = None if cfg.se_dims == "none" else cfg.se_dims

        tv = None
        if time_valid is not None:
            x = time_mask(x, time_valid)
            tv = conv_out_count(time_valid, cfg.in_conv_kernel, cfg.in_conv_stride)
        x = ConvNormAct(table[0].input_channels, cfg.in_conv_kernel,
                        cfg.in_conv_stride, dtype=self.dtype, name="stem")(x, train)
        block_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                     if cfg.remat else InvertedResidual)
        for i, cnf in enumerate(table):
            x = block_cls(cnf, se_dims, cfg.se_agg, cfg.se_r,
                          f_dim=fm_sizes[i][0], t_dim=fm_sizes[i][1],
                          dtype=self.dtype, name=f"block{i}")(x, train, tv)
            if tv is not None:
                stride = 1 if cnf.dilation > 1 else cnf.stride
                tv = conv_out_count(tv, cnf.kernel, stride, cnf.dilation)
        x = ConvNormAct(6 * table[-1].out_channels, 1, dtype=self.dtype,
                        name="tail")(x, train)

        if tv is not None:
            embedding = masked_time_mean(x, tv)
        else:
            embedding = jnp.mean(x, axis=(1, 2))

        if cfg.head_type == "mlp":
            logits = MlpHead(last_channel, cfg.num_classes, cfg.dropout,
                             dtype=self.dtype, name="head")(x, train, tv)
        elif cfg.head_type == "fully_convolutional":
            logits = FullyConvHead(cfg.num_classes, dtype=self.dtype,
                                   name="head")(x, train, tv)
        elif cfg.head_type == "multihead_attention_pooling":
            logits = MultiHeadAttentionPooling(
                6 * table[-1].out_channels, cfg.num_classes,
                cfg.multihead_attention_heads, dtype=self.dtype,
                name="head")(x, tv)
        else:
            raise NotImplementedError(
                f"Head '{cfg.head_type}' unknown. Must be one of: 'mlp', "
                f"'fully_convolutional', 'multihead_attention_pooling'")
        return logits, embedding


def output_time_frames(cfg, t_in):
    """Valid output-time-frame count after the conv stack.

    Works elementwise on ints or integer arrays (jnp/np). Note the model's
    ``time_valid`` argument takes INPUT mel-frame counts and derives the
    per-stage counts itself; this helper remains for analysis/tests.
    """
    def conv_out(t, k, s, d):
        pad = (k - 1) // 2 * d
        return (t + 2 * pad - d * (k - 1) - 1) // s + 1

    table, _ = cfg.block_table()
    t = conv_out(t_in, cfg.in_conv_kernel, cfg.in_conv_stride, 1)
    for cnf in table:
        stride = 1 if cnf.dilation > 1 else cnf.stride
        t = conv_out(t, cnf.kernel, stride, cnf.dilation)
    return t
