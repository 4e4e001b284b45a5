"""Shared flax.linen building blocks, NHWC layout.

TPU-first design notes:
- All feature maps are (B, F, T, C) — channels in the lane dimension, so
  1x1 convs and SE scalings are MXU matmuls / VPU broadcasts with no
  transposes.
- Convs use torch-style *explicit symmetric padding* ((k-1)//2 * dilation on
  both sides), NOT XLA 'SAME': for stride-2 even-sized inputs the two differ
  by one sample of left-context, which would break checkpoint parity
  (reference conv padding: models/mn/block_types.py:115-117 via torchvision
  ConvNormActivation).
- BatchNorm matches reference eps=1e-3 / torch momentum 0.01 (flax
  momentum 0.99), models/mn/model.py:114-115.

Reference behavior: ConvNormActivation stacks (torchvision), InvertedResidual
(models/mn/block_types.py:120-181), ConcurrentSEBlock/SqueezeExcitation
(:10-83), MultiHeadAttentionPooling (models/mn/attention_pooling.py:9-56).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from efficientat_tpu.utils.common import cnn_out_size, make_divisible

# Activation registry: reference "RE" -> ReLU, "HS" -> Hardswish.
ACTIVATIONS = {
    "RE": nn.relu,
    "HS": nn.hard_swish,
}

BN_MOMENTUM = 0.99  # torch momentum 0.01 == flax decay 0.99
BN_EPS = 1e-3

# torch kaiming_normal_(mode="fan_out") equivalent for conv kernels
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# torch nn.init.normal_(std=0.01) for Linear layers (models/mn/model.py:207-210)
dense_init = nn.initializers.normal(stddev=0.01)


def torch_pad(kernel: int, dilation: int = 1) -> Tuple[int, int]:
    p = (kernel - 1) // 2 * dilation
    return (p, p)


class ConvNormAct(nn.Module):
    """Conv2d (no bias) -> BatchNorm -> optional activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.hard_swish
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = torch_pad(self.kernel, self.dilation)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[pad, pad],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


# Axis of (B, F, T, C) each SE dimension letter refers to.
_SE_AXES = {"c": 3, "f": 1, "t": 2}


def time_mask(x: jnp.ndarray, time_valid) -> jnp.ndarray:
    """Zero NHWC ``x`` beyond ``time_valid[b]`` frames along the T axis.

    Inserted before every op that mixes time positions (depthwise convs,
    time-pooled means) during variable-length evaluation, so the padded
    region behaves exactly like the zero padding an exact-shape conv would
    apply at its boundary."""
    mask = (jnp.arange(x.shape[2])[None, :] < time_valid[:, None]).astype(x.dtype)
    return x * mask[:, None, :, None]


def conv_out_count(t, kernel: int, stride: int, dilation: int = 1):
    """Output positions of a torch-padded conv given ``t`` valid inputs.

    Elementwise on Python ints or integer (jnp/np) arrays."""
    pad = (kernel - 1) // 2 * dilation
    return (t + 2 * pad - dilation * (kernel - 1) - 1) // stride + 1


class SqueezeExcitation(nn.Module):
    """SE over one of {channel, frequency, time}.

    Pools (mean) over the other two axes, bottleneck MLP (fc1-ReLU-fc2),
    sigmoid gate broadcast back along ``se_axis``. Mirrors the reference's
    generalized SE (models/mn/block_types.py:45-83) where the gated axis is
    configurable rather than hardwired to channels.
    """

    input_dim: int
    squeeze_dim: int
    se_axis: int  # axis of (B, F, T, C)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_valid=None):
        reduce_axes = tuple(a for a in (1, 2, 3) if a != self.se_axis)
        if time_valid is None or self.se_axis == 2:
            # for the time-gated SE the squeeze does not reduce over time, so
            # gates at valid positions are exact without masking
            scale = jnp.mean(x, axis=reduce_axes)  # (B, d)
        else:
            # masked mean over time (x must be pre-masked with time_mask)
            denom = 1
            for a in reduce_axes:
                if a != 2:
                    denom *= x.shape[a]
            counts = denom * time_valid.astype(x.dtype)  # (B,)
            scale = jnp.sum(x, axis=reduce_axes) / counts[:, None]
        scale = nn.Dense(self.squeeze_dim, kernel_init=dense_init, dtype=self.dtype, name="fc1")(scale)
        scale = nn.relu(scale)
        scale = nn.Dense(self.input_dim, kernel_init=dense_init, dtype=self.dtype, name="fc2")(scale)
        scale = nn.sigmoid(scale)
        shape = [x.shape[0], 1, 1, 1]
        shape[self.se_axis] = self.input_dim
        return x * scale.reshape(shape)


class ConcurrentSEBlock(nn.Module):
    """Apply SE concurrently on a subset of {c, f, t}, fuse with an agg op.

    Reference: models/mn/block_types.py:10-42. ``se_dims`` is a string like
    "c", "cf", "cft"; ``se_agg`` one of max/avg/add/min.
    """

    c_dim: int
    f_dim: int
    t_dim: int
    se_dims: str = "c"
    se_agg: str = "max"
    se_r: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_valid=None):
        dims = {"c": self.c_dim, "f": self.f_dim, "t": self.t_dim}
        outs = []
        for letter in self.se_dims:
            d = dims[letter]
            squeeze = make_divisible(d // self.se_r, 8)
            outs.append(
                SqueezeExcitation(d, squeeze, _SE_AXES[letter], dtype=self.dtype,
                                  name=f"se_{letter}")(x, time_valid)
            )
        if len(outs) == 1:
            return outs[0]
        stacked = jnp.stack(outs, axis=0)
        agg = {
            "max": lambda s: jnp.max(s, axis=0),
            "avg": lambda s: jnp.mean(s, axis=0),
            "add": lambda s: jnp.sum(s, axis=0),
            "min": lambda s: jnp.min(s, axis=0),
        }[self.se_agg]
        return agg(stacked)


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """One inverted-residual block row (already width-adjusted)."""

    input_channels: int
    kernel: int
    expanded_channels: int
    out_channels: int
    use_se: bool
    activation: str  # "RE" | "HS"
    stride: int
    dilation: int

    @staticmethod
    def make(input_channels, kernel, expanded_channels, out_channels, use_se,
             activation, stride, dilation, width_mult):
        adj = lambda c: make_divisible(c * width_mult, 8)
        return BlockConfig(adj(input_channels), kernel, adj(expanded_channels),
                           adj(out_channels), use_se, activation, stride, dilation)

    def out_size(self, in_size: int) -> int:
        padding = (self.kernel - 1) // 2 * self.dilation
        return cnn_out_size(in_size, padding, self.dilation, self.kernel, self.stride)

    @property
    def use_res(self) -> bool:
        return self.stride == 1 and self.input_channels == self.out_channels


class InvertedResidual(nn.Module):
    """MobileNetV3 inverted residual: expand 1x1 -> depthwise kxk -> [SE] -> project 1x1.

    Residual iff stride==1 and C_in==C_out (models/mn/block_types.py:132).
    """

    cnf: BlockConfig
    se_dims: Optional[str] = "c"
    se_agg: str = "max"
    se_r: int = 4
    f_dim: int = 0  # feature-map sizes after this block, for f/t SE
    t_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, time_valid=None):
        """``time_valid`` (B,): valid input time frames; enables exact
        variable-length evaluation — the padded region is re-zeroed before
        the depthwise conv and excluded from the SE squeeze, so valid output
        positions match an exact-shape forward bit-for-bit (up to fp
        rounding)."""
        cnf = self.cnf
        act = ACTIVATIONS[cnf.activation]
        inp = x
        if cnf.expanded_channels != cnf.input_channels:
            x = ConvNormAct(cnf.expanded_channels, 1, act=act, dtype=self.dtype,
                            name="expand")(x, train)
        stride = 1 if cnf.dilation > 1 else cnf.stride
        tv_out = None
        if time_valid is not None:
            x = time_mask(x, time_valid)
            tv_out = conv_out_count(time_valid, cnf.kernel, stride, cnf.dilation)
        x = ConvNormAct(cnf.expanded_channels, cnf.kernel, stride, cnf.dilation,
                        groups=cnf.expanded_channels, act=act, dtype=self.dtype,
                        name="depthwise")(x, train)
        if tv_out is not None:
            x = time_mask(x, tv_out)
        if cnf.use_se and self.se_dims:
            x = ConcurrentSEBlock(cnf.expanded_channels, self.f_dim, self.t_dim,
                                  self.se_dims, self.se_agg, self.se_r,
                                  dtype=self.dtype, name="se")(x, tv_out)
        x = ConvNormAct(cnf.out_channels, 1, act=None, dtype=self.dtype,
                        name="project")(x, train)
        if cnf.use_res:
            x = x + inp
        return x


def masked_time_mean(x: jnp.ndarray, time_valid) -> jnp.ndarray:
    """Mean over (F, T) of NHWC x, counting only the first ``time_valid[b]``
    frames per sample. Enables bucket-padded variable-length evaluation
    (the reference instead evaluates exact lengths at batch 1,
    ex_fsd50k.py:73-77).

    Together with the per-stage ``time_mask`` re-zeroing inside the blocks
    (padded frames then coincide with the zero padding an exact-shape conv
    applies at its boundary) and the host-side pre-emphasis-aware pad
    continuation (``data.core.exact_eval_pad``), the batched masked forward
    equals the exact-shape batch-1 forward to fp32 rounding
    (tests/test_train_cli.py::test_masked_variable_eval_exact)."""
    t = x.shape[2]
    mask = (jnp.arange(t)[None, :] < time_valid[:, None]).astype(x.dtype)
    x = x * mask[:, None, :, None]
    denom = (x.shape[1] * time_valid).astype(x.dtype)[:, None]
    return x.sum(axis=(1, 2)) / denom


class MultiHeadAttentionPooling(nn.Module):
    """PSLA-style attention pooling head (models/mn/attention_pooling.py:9-56).

    Input (B, F, T, C): frequency is mean-pooled, a single projection
    produces per-head attention and value paths over time, attention is
    sigmoid-clamped and normalized over time, heads are combined with a
    learnable weight initialized to 1/heads.
    """

    in_dim: int
    out_dim: int
    num_heads: int = 4
    epsilon: float = 1e-7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_valid=None):
        x = jnp.mean(x, axis=1)  # (B, T, C)
        b, n, _ = x.shape
        proj = nn.Dense(self.out_dim * 2 * self.num_heads, kernel_init=dense_init,
                        dtype=self.dtype, name="subspace_proj")(x)
        proj = proj.reshape(b, n, 2, self.num_heads, self.out_dim)
        att = jnp.transpose(proj[:, :, 0], (0, 2, 1, 3))  # (B, heads, T, out)
        val = jnp.transpose(proj[:, :, 1], (0, 2, 1, 3))
        att = jnp.clip(nn.sigmoid(att), self.epsilon, 1.0 - self.epsilon)
        if time_valid is not None:
            tmask = (jnp.arange(n)[None, :] < time_valid[:, None])
            att = jnp.where(tmask[:, None, :, None], att, 0.0)
        att = att / jnp.sum(att, axis=2, keepdims=True)
        out = jnp.sum(att * val, axis=2)  # (B, heads, out)
        head_weight = self.param(
            "head_weight",
            lambda key: jnp.full((1, self.num_heads, 1), 1.0 / self.num_heads, jnp.float32),
        )
        return jnp.sum(out * head_weight, axis=1)


class MlpHead(nn.Module):
    """Global avg-pool -> Dense -> Hardswish -> Dropout -> Dense."""

    last_channel: int
    num_classes: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, time_valid=None):
        if time_valid is not None:
            x = masked_time_mean(x, time_valid)
        else:
            x = jnp.mean(x, axis=(1, 2))  # (B, C)
        x = nn.Dense(self.last_channel, kernel_init=dense_init, dtype=self.dtype,
                     name="hidden")(x)
        x = nn.hard_swish(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, kernel_init=dense_init, dtype=self.dtype,
                        name="out")(x)


class FullyConvHead(nn.Module):
    """1x1 conv (no bias) -> BatchNorm -> global avg-pool."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, time_valid=None):
        x = nn.Conv(self.num_classes, (1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name="conv")(x)
        # torch default BN here: eps=1e-5, momentum 0.1 (models/mn/model.py:183)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        if time_valid is not None:
            return masked_time_mean(x, time_valid)
        return jnp.mean(x, axis=(1, 2))
