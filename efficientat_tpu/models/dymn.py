"""DyMN — Dynamic MobileNet audio tagger, flax.linen, NHWC.

Reference behavior: models/dymn/model.py:36-361 and models/dymn/dy_block.py.
Each DY block computes a shared context (ContextGen), then:
expand DynamicConv 1x1 -> BN -> act -> depthwise DynamicConv kxk -> BN ->
DyReLU-B -> Coordinate Attention -> project DynamicConv 1x1 -> BN -> (+res).

DynamicConv lowering (dy_block.py:44-131), chosen by on-chip measurement
(scripts/bench_dyconv_micro.py / bench_pw_micro.py):
- 1x1 dynamic convs aggregate the K weight banks per sample
  (``att @ banks``) and run as one batched matmul over the FLATTENED
  spatial dim (``einsum('bni,bio->bno')``) — the 4D form
  ``bfti,bio->bfto`` triggers a ~1000x-slower XLA path at early-block
  shapes (B=64, 64x500x16: 6.8 s vs 2.7 ms).
- dynamic depthwise convs fold batch into conv feature groups
  (``(1, F, T, B*C)``, ``feature_group_count=B*C``) — the same fold the
  reference uses on CUDA; XLA-TPU lowers it within ~1.5x of a static
  depthwise conv, 14-30x faster than an unrolled shift-and-add, and —
  despite micro-bench wins for a channel-multiplier alternative — faster
  in-model at every shape (see ``_dynamic_depthwise_cm`` for the measured
  negative result). Under a data-parallel mesh the fold shard_maps over
  the batch so each device folds only its own shard (see
  ``_dynamic_depthwise``); large serving batches are micro-batched at the
  model level instead (infer/microbatch.py — see the batch-scaling note
  above ``_dynamic_depthwise_local``).

The DynamicConv softmax temperature anneals per epoch
(dy_block.py:133-139); it is passed in as a traced scalar so changing it
never recompiles.

Train-step cost attribution (TPU v5e, B=120, slope-timed best-of-2 —
reproduce with ``scripts/bench_train_stages.py dymn[,ablation]``; r4
sessions, cross-checked by ``scripts/probe_train_overhead.py``):

    config            fwd_ms  fwd_bwd_ms  full_ms  clips/s
    dymn10            65.2    210.2       209.8    571.9
    dymn10,no_dyconv  18.1    57.0        90.8     1321.5
    dymn10,no_dyrelu  65.8    203.8       —        —
    dymn10,pw=shared_out 110.7 331.2      257.6    465.9
    mn10 (reference)  17.8    52.7        81.6     1470.0

i.e. ~75% of both forward and backward IS the dynamic-conv machinery
(banks aggregation + batched pw matmuls + grouped depthwise fold);
DyReLU+CoordAtt cost ~3%. The shared_out pointwise lowering is 1.6x
WORSE at train shapes (it wins only at tiny serving micro-batches), so
``per_sample`` stays the default. With the dyconv path at 3.7x the cost
of the static convs it replaces (fwd 65.2 vs 18.1 ms) and every stage
already matmul-shaped, the remaining gap to MN is the price of the
per-sample weight banks themselves — a roofline consequence of K=4
weight banks read per sample, not a lowering artifact. (The MN full
step decomposes as fwd_bwd 52.7 + mel/mixup/KD ~5 + optimizer & weight
carry ~20 ms — the carry cost is per-step weight relayout, measured by
the probe's noopt vs noopt_carry variants, 58.2 vs 79.7 ms.)

r5 exhaustion of the remaining knobs (same session, same chip, KD train
step B=120 unless noted — ``scripts/probe_dymn_r5.py``):

    config                       clips/s
    fp32                          534.3
    bf16                          667.7
    bf16 + remat                  769.8   <- ADOPTED recommendation
    bf16 B=240 (B=120-equiv)      542.2   batch cliff, negative
    bf16 B=240 + remat            476.9   negative
    bf16 2x60 grad-accum          632.1   negative
    fp32 + dyconv-bf16 mix        526.5   negative (dyconv_compute)

- ``remat=True`` is a measured +15% on the bf16 train step (and the
  memory win is free): recomputing block activations in the backward
  pass beats writing them to HBM for this bandwidth-bound net. The
  train CLI's ``--remat`` flag is the recommended DyMN setting.
- A Pallas epilogue fusing BN+DyReLU+CoordAtt onto the depthwise fold
  has NO headroom: ablating DyReLU+CoordAtt entirely does not speed the
  bf16 forward (2264 full vs 1950 ablated clips/s, i.e. within noise
  the epilogue ops are already fused by XLA — consistent with the r4
  stage table's no_dyrelu row).
- bf16 bank aggregation + per-sample GEMMs inside the fp32 model
  (``DyMNConfig.dyconv_compute="bfloat16"``, fp32 accumulation) is a
  wash (526.5 vs 534.3): the K=4 banks are small, activation traffic
  dominates, and the grouped fold gains nothing from narrower operands.
  Kept as a tested option (tests/test_models.py) for serving stacks
  that want the memory halving on the banks.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efficientat_tpu.models.layers import (
    ACTIVATIONS,
    masked_time_mean,
    BN_EPS,
    BN_MOMENTUM,
    BlockConfig,
    ConvNormAct,
    FullyConvHead,
    InvertedResidual,
    MlpHead,
    conv_out_count,
    dense_init,
    time_mask,
)
from efficientat_tpu.models.mn import mn_block_table
from efficientat_tpu.utils.common import make_divisible


def dyconv_temperature(epoch: int, t_max: float = 30.0, t_min: float = 1.0,
                       t0_slope: float = 1.0, t1_slope: float = 0.02) -> float:
    """Per-epoch DynamicConv softmax temperature (dy_block.py:133-139)."""
    t0 = t_max - t0_slope * epoch
    t1 = 1 + t1_slope * (t_max - 1) / t0_slope - t1_slope * epoch
    return max(t0, t1, t_min)


def _bank_init(k: int, fan_out: int):
    """torch kaiming_normal_(mode=fan_out) applied per weight bank."""
    std = float(np.sqrt(2.0 / fan_out))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class DynamicConv(nn.Module):
    """K-bank dynamic convolution; per-sample kernel = softmax-attention mix.

    Only the two shapes the architecture uses are implemented:
    pointwise (kernel 1, groups 1) and full depthwise (groups == channels).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    k: int = 4
    # pointwise lowering (see scripts/probe_pw_shared.py):
    # - "per_sample": per-sample kernel wb = att @ banks, then a batched
    #   matmul — B small GEMMs with contraction dim as low as 16.
    # - "shared_out": ONE shared-weight GEMM with K*Co output columns
    #   (full MXU weight reuse, 4x the FLOPs), then contract with att.
    # - "shared_in": elementwise expand to K*Ci then one GEMM.
    # All three compute y[b,n,o] = sum_{k,i} att[b,k] x[b,n,i] W[k,i,o]
    # (equivalence pinned in tests/test_models.py).
    pw_form: str = "per_sample"
    # feature-map layout this conv consumes and produces:
    # - "nhwc": (B, F, T, C) — the canonical layout
    # - "ftbc": (F, T, B, C) — batch-minor residency that makes the
    #   depthwise fold's (1, F, T, B*C) reshape FREE (no transpose);
    #   see DyMNConfig.layout
    layout: str = "nhwc"
    # compute dtype for the bank aggregation + per-sample conv ONLY
    # (None -> model dtype). "bfloat16" inside an fp32 model halves the
    # K=4-bank read traffic and runs the per-sample GEMMs/fold on the
    # bf16 MXU path while ACCUMULATING fp32 (preferred_element_type), so
    # params/BN/optimizer stay fp32; see DyMNConfig.dyconv_compute.
    mix_dtype: jnp.dtype | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h_c, temperature):
        logits = nn.Dense(self.k, kernel_init=dense_init, dtype=self.dtype,
                          name="att")(h_c)
        # softmax in f32 (temperature is an f32 scalar; K=4 logits cost
        # nothing), then back to the compute dtype: without the cast the
        # f32 ``att`` promotes every kernel-mixing einsum — and under
        # bf16 the depthwise conv CRASHES on lax.conv's strict dtype
        # match (bf16 x vs f32-promoted wb)
        att = jax.nn.softmax(logits / temperature, axis=-1)  # (B, K)
        att = att.astype(self.dtype)

        ks = self.kernel_size
        fan_out = self.out_channels * ks * ks
        ftbc = self.layout == "ftbc"
        mix = self.mix_dtype
        mixed = mix is not None and mix != self.dtype
        if ks == 1 and self.groups == 1:
            w = self.param(
                "weight", _bank_init(self.k, fan_out),
                (self.k, self.in_channels, self.out_channels))
            if mixed and not ftbc and self.pw_form == "per_sample":
                b, f, t, ci = x.shape
                x2 = x.reshape(b, f * t, ci).astype(mix)
                wb = jnp.einsum("bk,kio->bio", att.astype(mix), w.astype(mix))
                y = jnp.einsum("bni,bio->bno", x2, wb,
                               preferred_element_type=self.dtype)
                return y.reshape(b, f, t, self.out_channels)
            w = w.astype(self.dtype)
            if ftbc:
                f, t, b, ci = x.shape
                x2 = x.reshape(f * t, b, ci)  # free: (F,T) are major axes
                wb = jnp.einsum("bk,kio->bio", att, w)
                y = jnp.einsum("nbi,bio->nbo", x2, wb,
                               preferred_element_type=self.dtype)
                return y.reshape(f, t, b, self.out_channels)
            b, f, t, ci = x.shape
            x2 = x.reshape(b, f * t, ci)
            if self.pw_form == "shared_out":
                u = jnp.einsum("bni,kio->bnko", x2, w,
                               preferred_element_type=self.dtype)
                y = jnp.einsum("bnko,bk->bno", u, att,
                               preferred_element_type=self.dtype)
            elif self.pw_form == "shared_in":
                z = att[:, None, :, None] * x2[:, :, None, :]  # (B,N,K,Ci)
                y = jnp.einsum("bnkc,kco->bno", z, w,
                               preferred_element_type=self.dtype)
            else:
                wb = jnp.einsum("bk,kio->bio", att, w)
                y = jnp.einsum("bni,bio->bno", x2, wb,
                               preferred_element_type=self.dtype)
            return y.reshape(b, f, t, self.out_channels)
        if self.groups == self.in_channels == self.out_channels:
            w = self.param(
                "weight", _bank_init(self.k, fan_out),
                (self.k, ks, ks, self.in_channels))
            if ftbc:
                # mix straight into the fold's rhs layout (ks, ks, B, C)
                wb = jnp.einsum("bk,kuvc->uvbc", att, w.astype(self.dtype))
                return _dynamic_depthwise_ftbc(x, wb, ks, self.stride,
                                               self.dilation)
            if mixed:
                # conv runs fully in the mix dtype and the OUTPUT is cast
                # back: preferred_element_type on a grouped conv breaks its
                # VJP (the fp32 cotangent meets bf16 operands in the
                # transposed conv and lax rejects the dtype mix). A
                # depthwise conv accumulates only k^2 (9-25) terms, so bf16
                # accumulation is benign; the K-bank/pointwise einsums keep
                # true fp32 accumulation via preferred_element_type.
                wb = jnp.einsum("bk,kuvc->buvc", att.astype(mix), w.astype(mix))
                y = _dynamic_depthwise(x.astype(mix), wb, ks, self.stride,
                                       self.dilation)
                return y.astype(self.dtype)
            wb = jnp.einsum("bk,kuvc->buvc", att, w.astype(self.dtype))
            return _dynamic_depthwise(x, wb, ks, self.stride, self.dilation)
        raise NotImplementedError(
            "DynamicConv supports pointwise (k=1, groups=1) and full depthwise only")


def _dynamic_depthwise_cm(x, w, att, ks: int, stride: int, dilation: int):
    """Per-sample depthwise conv as ONE static conv with channel multiplier K.

    x: (B, F, T, C); w: (K, ks, ks, C); att: (B, K). Output channel c*K+k
    is bank k applied to input channel c (feature_group_count=C), then the
    K outputs are mixed per sample with ``att`` — identical math to mixing
    the kernels first (mixing outputs of a linear op == mixing kernels).

    NOT used by the model: in isolated micro-benches this form beats the
    batch-into-groups fold 2x at the k3/s2 block-1 shape and ~10-20% at
    C>=480 (scripts/bench_dyconv2.py), but measured IN-MODEL it is slower
    (dymn10 fp32 B=64: 1633 clips/s all-cm, 1584 b1-only, vs 1844 with the
    fold) — the K-times-wider conv output breaks XLA's fusion of the
    following BN/DyReLU chain. Kept (with an equivalence test) as the
    documented negative result so the experiment isn't re-run blind.
    """
    b, f, t, c = x.shape
    k = w.shape[0]
    p = (ks - 1) // 2 * dilation
    rhs = jnp.transpose(w, (1, 2, 3, 0)).reshape(ks, ks, 1, c * k)
    out = jax.lax.conv_general_dilated(
        x, rhs, (stride, stride), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    fo, to = out.shape[1], out.shape[2]
    out = out.reshape(b, fo, to, c, k)
    return jnp.einsum("bftck,bk->bftc", out, att)


def _dynamic_depthwise_fold(x, w, ks: int, stride: int, dilation: int):
    """Depthwise conv with per-sample kernels as ONE grouped conv.

    x: (B, F, T, C); w: (B, ks, ks, C). Batch folds into the channel/lane
    dim — lhs (1, F, T, B*C), feature_group_count=B*C — so XLA's conv
    emitter sees a single static-shape depthwise conv. Cross-correlation
    with torch-style symmetric padding (k-1)//2 * dilation.
    """
    b, f, t, c = x.shape
    p = (ks - 1) // 2 * dilation
    lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, f, t, b * c)
    rhs = jnp.transpose(w, (1, 2, 0, 3)).reshape(ks, ks, 1, b * c)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (stride, stride), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    fo, to = out.shape[1], out.shape[2]
    return jnp.transpose(out.reshape(fo, to, b, c), (2, 0, 1, 3))


# Batch scaling note (measured 2026-08-17, scripts/probe_dymn_batch.py):
# dymn10 per-clip cost REGRESSES from B=64 to B=256 (505 -> 778 us model-
# only) even though every constituent op IMPROVES with batch in isolation
# (the fold k3s2 C64: 78.7 -> 66.4 us/clip; pointwise einsum 19.5 -> 8.4;
# mel 88.6 -> 64.6; no_dyconv model 153 -> 105). Chunking the fold itself
# at a 64-sample slice was tried and is 5-20% SLOWER at every shape — the
# cliff is a composition effect around the dynamic convs, not conv group
# count. Serving therefore micro-batches the MODEL at its measured best
# batch (infer/microbatch.py) instead of lowering tricks here.
def _dynamic_depthwise_local(x, w, ks: int, stride: int, dilation: int):
    """Single-device lowering of the per-sample depthwise conv."""
    return _dynamic_depthwise_fold(x, w, ks, stride, dilation)


def _dynamic_depthwise_ftbc(x, w, ks: int, stride: int, dilation: int):
    """Per-sample depthwise conv on a batch-minor-resident tensor.

    x: (F, T, B, C); w: (ks, ks, B, C). The (1, F, T, B*C) grouped-conv
    fold is a pure RESHAPE here — (F, T) are already the major axes — so
    the two physical transposes `_dynamic_depthwise_fold` pays per call
    vanish; the output stays (Fo, To, B, C) for the next resident op.
    """
    from efficientat_tpu.parallel.spmd import current_data_mesh

    ctx = current_data_mesh()
    if ctx is not None:
        mesh, axis = ctx
        n = mesh.shape[axis]
        if n > 1 and x.shape[2] % n == 0:
            from jax.sharding import PartitionSpec as P

            spec = P(None, None, axis, None)
            fn = jax.shard_map(
                lambda xs, ws: _dynamic_depthwise_ftbc_local(
                    xs, ws, ks, stride, dilation),
                mesh=mesh, in_specs=(spec, P(None, None, axis, None)),
                out_specs=spec)
            return fn(x, w)
    return _dynamic_depthwise_ftbc_local(x, w, ks, stride, dilation)


def _dynamic_depthwise_ftbc_local(x, w, ks: int, stride: int, dilation: int):
    f, t, b, c = x.shape
    p = (ks - 1) // 2 * dilation
    lhs = x.reshape(1, f, t, b * c)
    rhs = w.reshape(ks, ks, 1, b * c)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (stride, stride), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return out.reshape(out.shape[1], out.shape[2], b, c)


def _dynamic_depthwise(x, w, ks: int, stride: int, dilation: int):
    """Per-sample depthwise conv, SPMD-safe under a data-parallel mesh.

    The fold merges the batch axis into conv feature groups — fine on one
    device, but under pjit with batch sharded ``P('data')`` the reshape
    forces a cross-device regroup. When the train/eval steps publish their
    mesh (parallel/spmd.py), the fold runs inside ``jax.shard_map`` over
    the data axis so each device folds only its own batch shard — the
    moral equivalent of the reference's per-process DDP fold
    (models/dymn/dy_block.py:116-127 under ex_pl_audioset.py:287-296).
    The surrounding 1x1 dynamic convs need no such treatment: they are
    batched matmuls (``bni,bio->bno``) whose batch dim the partitioner
    shards natively.
    """
    from efficientat_tpu.parallel.spmd import current_data_mesh

    ctx = current_data_mesh()
    if ctx is not None:
        mesh, axis = ctx
        n = mesh.shape[axis]
        if n > 1 and x.shape[0] % n == 0:
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                lambda xs, ws: _dynamic_depthwise_local(xs, ws, ks, stride,
                                                        dilation),
                mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis))
            return fn(x, w)
    return _dynamic_depthwise_local(x, w, ks, stride, dilation)


class ContextGen(nn.Module):
    """Shared context for Dy-ReLU / Dy-Conv / Coordinate Attention.

    Reference: dy_block.py:214-254. Frequency- and time-pooled sequences are
    concatenated, passed through a shared linear+BN+Hardswish, and split into
    (a) a pooled context vector h_c of size H and (b) per-frequency /
    per-time coordinate-attention tensors projected to the expanded width.
    """

    context_dim: int
    exp_channels: int
    stride: int = 1
    layout: str = "nhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, time_valid=None):
        """``time_valid`` (B,): valid input time frames. Padded frames are
        excluded from the time-pooled branch and from the shared context
        mean, so h_c / g_cf (and the valid positions of g_ct) match an
        exact-shape forward."""
        if self.layout == "ftbc":
            # (F, T, B, C) resident: identical math with the pooled-sequence
            # axis leading; parameters (Dense over C, BN over C) are
            # checkpoint-identical to the nhwc path.
            assert time_valid is None
            f, t = x.shape[0], x.shape[1]
            cf = jnp.mean(x, axis=1)  # (F, B, C)
            ct = jnp.mean(x, axis=0)  # (T, B, C)
            g_cat = jnp.concatenate([cf, ct], axis=0)  # (F+T, B, C)
            g_cat = nn.Dense(self.context_dim, use_bias=False,
                             kernel_init=dense_init, dtype=self.dtype,
                             name="joint")(g_cat)
            g_cat = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name="joint_bn")(g_cat)
            g_cat = nn.hard_swish(g_cat)
            h_cf, h_ct = g_cat[:f], g_cat[f:]
            h_c = jnp.mean(g_cat, axis=0)  # (B, H)
            if self.stride > 1:
                h_cf = _seq_avg_pool_ax0(h_cf, self.stride)
                h_ct = _seq_avg_pool_ax0(h_ct, self.stride)
            g_cf = nn.Dense(self.exp_channels, kernel_init=dense_init,
                            dtype=self.dtype, name="proj_f")(h_cf)  # (F',B,exp)
            g_ct = nn.Dense(self.exp_channels, kernel_init=dense_init,
                            dtype=self.dtype, name="proj_t")(h_ct)  # (T',B,exp)
            return h_c, g_cf, g_ct
        f, t = x.shape[1], x.shape[2]
        if time_valid is not None:
            xm = time_mask(x, time_valid)
            cf = jnp.sum(xm, axis=2) / time_valid.astype(x.dtype)[:, None, None]
            ct = jnp.mean(xm, axis=1)  # (B, T, C); invalid positions masked below
        else:
            cf = jnp.mean(x, axis=2)  # (B, F, C)
            ct = jnp.mean(x, axis=1)  # (B, T, C)
        g_cat = jnp.concatenate([cf, ct], axis=1)  # (B, F+T, C)
        g_cat = nn.Dense(self.context_dim, use_bias=False, kernel_init=dense_init,
                         dtype=self.dtype, name="joint")(g_cat)
        g_cat = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype, name="joint_bn")(g_cat)
        g_cat = nn.hard_swish(g_cat)

        if time_valid is not None:
            b = x.shape[0]
            seq_valid = jnp.concatenate(
                [jnp.ones((b, f), bool),
                 jnp.arange(t)[None, :] < time_valid[:, None]], axis=1)
            g_cat = g_cat * seq_valid[..., None].astype(g_cat.dtype)
            h_cf, h_ct = g_cat[:, :f], g_cat[:, f:]
            h_c = jnp.sum(g_cat, axis=1) / (
                f + time_valid).astype(g_cat.dtype)[:, None]
        else:
            h_cf, h_ct = g_cat[:, :f], g_cat[:, f:]
            h_c = jnp.mean(g_cat, axis=1)  # (B, H)

        if self.stride > 1:
            h_cf = _seq_avg_pool(h_cf, self.stride)
            h_ct = _seq_avg_pool(h_ct, self.stride)
        g_cf = nn.Dense(self.exp_channels, kernel_init=dense_init, dtype=self.dtype,
                        name="proj_f")(h_cf)  # (B, F', exp)
        g_ct = nn.Dense(self.exp_channels, kernel_init=dense_init, dtype=self.dtype,
                        name="proj_t")(h_ct)  # (B, T', exp)
        return h_c, g_cf, g_ct


def _seq_avg_pool(x, stride: int):
    """AvgPool k=3, padding=1 along axis 1 of (B, S, C), count_include_pad."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    s_out = (x.shape[1] + 2 - 3) // stride + 1
    acc = sum(
        jax.lax.slice_in_dim(xp, d, d + (s_out - 1) * stride + 1, stride, axis=1)
        for d in range(3)
    )
    return acc / 3.0


def _seq_avg_pool_ax0(x, stride: int):
    """Same pooling along axis 0 of (S, B, C) (the ftbc-resident layout)."""
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    s_out = (x.shape[0] + 2 - 3) // stride + 1
    acc = sum(
        jax.lax.slice_in_dim(xp, d, d + (s_out - 1) * stride + 1, stride, axis=0)
        for d in range(3)
    )
    return acc / 3.0


class DyReLUB(nn.Module):
    """Dynamic ReLU (variant B): per-channel max of M learned linear maps.

    Reference: dy_block.py:142-188. theta = 2*sigmoid(W h_c) - 1;
    coefs = theta * [1]*M+[0.5]*M + [1,0,...]; out = max_m(x*a_m + b_m).
    """

    channels: int
    m: int = 2
    layout: str = "nhwc"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h_c):
        theta = nn.Dense(2 * self.m * self.channels, kernel_init=dense_init,
                         dtype=self.dtype, name="coef")(h_c)
        theta = 2.0 * nn.sigmoid(theta) - 1.0
        theta = theta.reshape(-1, self.channels, 2 * self.m)
        lambdas = jnp.asarray([1.0] * self.m + [0.5] * self.m, dtype=theta.dtype)
        init_v = jnp.asarray([1.0] + [0.0] * (2 * self.m - 1), dtype=theta.dtype)
        coefs = theta * lambdas + init_v  # (B, C, 2M)
        if self.layout == "ftbc":
            if self.m == 2:
                a0 = coefs[None, None, :, :, 0]  # (1,1,B,C)
                a1 = coefs[None, None, :, :, 1]
                b0 = coefs[None, None, :, :, 2]
                b1 = coefs[None, None, :, :, 3]
                return jnp.maximum(x * a0 + b0, x * a1 + b1)
            a = coefs[None, None, :, :, :self.m]  # (1,1,B,C,M)
            b = coefs[None, None, :, :, self.m:]
            return jnp.max(x[..., None] * a + b, axis=-1)
        if self.m == 2:
            # unrolled: two fused FMAs + maximum, no (B,F,T,C,M) tensor
            # (the reference makes the same specialization, dy_block.py:184-187)
            a0 = coefs[:, None, None, :, 0]
            a1 = coefs[:, None, None, :, 1]
            b0 = coefs[:, None, None, :, 2]
            b1 = coefs[:, None, None, :, 3]
            return jnp.maximum(x * a0 + b0, x * a1 + b1)
        a = coefs[:, None, None, :, :self.m]  # (B,1,1,C,M)
        b = coefs[:, None, None, :, self.m:]
        return jnp.max(x[..., None] * a + b, axis=-1)


def coord_att(x, g_cf, g_ct):
    """Coordinate attention: x * sigmoid(g_cf) * sigmoid(g_ct) (dy_block.py:191-201)."""
    return x * nn.sigmoid(g_cf)[:, :, None, :] * nn.sigmoid(g_ct)[:, None, :, :]


def coord_att_ftbc(x, g_cf, g_ct):
    """coord_att on the (F, T, B, C)-resident tensor; g_cf (F,B,C), g_ct (T,B,C)."""
    return x * nn.sigmoid(g_cf)[:, None, :, :] * nn.sigmoid(g_ct)[None, :, :, :]


class DYBlock(nn.Module):
    """Dynamic inverted residual block (dy_block.py:257-409)."""

    cnf: BlockConfig
    width_mult: float = 1.0
    context_ratio: int = 4
    max_context_size: int = 128
    min_context_size: int = 32
    dyrelu_k: int = 2
    dyconv_k: int = 4
    no_dyrelu: bool = False
    no_dyconv: bool = False
    no_ca: bool = False
    pw_form: str = "per_sample"
    layout: str = "nhwc"
    # "model" or "bfloat16": compute dtype of the dyconv machinery
    # (see DynamicConv.mix_dtype / DyMNConfig.dyconv_compute)
    dyconv_compute: str = "model"
    dtype: jnp.dtype = jnp.float32

    @property
    def mix_dtype(self):
        if self.dyconv_compute == "model":
            return None
        return jnp.dtype(self.dyconv_compute)

    @property
    def context_dim(self) -> int:
        return int(np.clip(
            make_divisible(self.cnf.expanded_channels // self.context_ratio, 8),
            make_divisible(self.min_context_size * self.width_mult, 8),
            make_divisible(self.max_context_size * self.width_mult, 8),
        ))

    @nn.compact
    def __call__(self, x, train: bool = False, temperature=1.0, time_valid=None):
        cnf = self.cnf
        act = ACTIVATIONS[cnf.activation]
        stride = 1 if cnf.dilation > 1 else cnf.stride
        inp = x
        ftbc = self.layout == "ftbc"
        if ftbc:
            # the resident layout is a pure-throughput path: static convs
            # (no_dyconv) and the masked variable-length eval stay nhwc
            assert not self.no_dyconv and time_valid is None

        h_c, g_cf, g_ct = ContextGen(self.context_dim, cnf.expanded_channels,
                                     stride=stride, layout=self.layout,
                                     dtype=self.dtype,
                                     name="context")(x, train, time_valid)

        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                       dtype=self.dtype, name=name)
        # expand
        if cnf.expanded_channels != cnf.input_channels:
            if self.no_dyconv:
                x = nn.Conv(cnf.expanded_channels, (1, 1), use_bias=False,
                            dtype=self.dtype, name="exp_conv")(x)
            else:
                x = DynamicConv(cnf.input_channels, cnf.expanded_channels,
                                k=self.dyconv_k, pw_form=self.pw_form,
                                layout=self.layout, mix_dtype=self.mix_dtype,
                                dtype=self.dtype,
                                name="exp_conv")(x, h_c, temperature)
            x = bn("exp_bn")(x)
            x = act(x)

        # depthwise
        tv_out = None
        if time_valid is not None:
            x = time_mask(x, time_valid)  # zeros == exact-shape conv padding
            tv_out = conv_out_count(time_valid, cnf.kernel, stride, cnf.dilation)
        pad = (cnf.kernel - 1) // 2 * cnf.dilation
        if self.no_dyconv:
            x = nn.Conv(cnf.expanded_channels, (cnf.kernel, cnf.kernel),
                        strides=(stride, stride), padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(cnf.dilation, cnf.dilation),
                        feature_group_count=cnf.expanded_channels, use_bias=False,
                        dtype=self.dtype, name="depth_conv")(x)
        else:
            x = DynamicConv(cnf.expanded_channels, cnf.expanded_channels,
                            kernel_size=cnf.kernel, stride=stride,
                            dilation=cnf.dilation, groups=cnf.expanded_channels,
                            k=self.dyconv_k, layout=self.layout,
                            mix_dtype=self.mix_dtype, dtype=self.dtype,
                            name="depth_conv")(x, h_c, temperature)
        x = bn("depth_bn")(x)
        if self.no_dyrelu:
            x = act(x)
        else:
            x = DyReLUB(cnf.expanded_channels, self.dyrelu_k,
                        layout=self.layout, dtype=self.dtype,
                        name="dyrelu")(x, h_c)
        if not self.no_ca:
            x = coord_att_ftbc(x, g_cf, g_ct) if ftbc else coord_att(x, g_cf, g_ct)

        # project
        if self.no_dyconv:
            x = nn.Conv(cnf.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="proj_conv")(x)
        else:
            x = DynamicConv(cnf.expanded_channels, cnf.out_channels,
                            k=self.dyconv_k, pw_form=self.pw_form,
                            layout=self.layout, mix_dtype=self.mix_dtype,
                            dtype=self.dtype,
                            name="proj_conv")(x, h_c, temperature)
        x = bn("proj_bn")(x)

        if cnf.use_res:
            x = x + inp
        return x


# Which of the 15 blocks are dynamic for use_dy_blocks="replace_se"
# (models/dymn/model.py:228-229): the 8 positions that have SE in MNv3.
_REPLACE_SE_MASK = (False, False, False, True, True, True, False, False,
                    False, False, True, True, True, True, True)


@dataclasses.dataclass(frozen=True)
class DyMNConfig:
    """Constructor surface of the reference get_model (models/dymn/model.py:289-361)."""

    num_classes: int = 527
    width_mult: float = 1.0
    strides: Tuple[int, int, int, int] = (2, 2, 2, 2)
    head_type: str = "mlp"  # mlp | fully_convolutional
    context_ratio: int = 4
    max_context_size: int = 128
    min_context_size: int = 32
    dyrelu_k: int = 2
    dyconv_k: int = 4
    no_dyrelu: bool = False
    no_dyconv: bool = False
    no_ca: bool = False
    # pointwise DynamicConv lowering: per_sample | shared_out | shared_in
    # (see DynamicConv.pw_form)
    pw_form: str = "per_sample"
    # feature-map residency through the dynamic blocks:
    # - "nhwc": canonical (B, F, T, C)
    # - "ftbc": (F, T, B, C) between the stem and the tail, which turns the
    #   dynamic-depthwise fold's two physical transposes per block into free
    #   reshapes. Parameters are layout-independent (identical checkpoints);
    #   applies only when every block is dynamic (use_dy_blocks="all",
    #   no_dyconv False) and falls back to nhwc for masked variable-length
    #   eval. MEASURED NEGATIVE (2026-08-19, v5e, B=120 full pipeline,
    #   scripts/probe_dymn_layout.py): ftbc is 11-13% SLOWER than nhwc
    #   (fp32 770.5 vs 862.6 clips/s; bf16 840.9 vs 965.2) — XLA already
    #   fuses the fold's transposes into the surrounding convs, and the
    #   batch-minor residency costs the static stem/pointwise lowerings
    #   more than it saves the fold. Kept equivalence-tested
    #   (tests/test_models.py::test_dymn_layouts_agree_eval_and_train) so
    #   the experiment isn't re-run blind. Default stays "nhwc".
    layout: str = "nhwc"
    # compute dtype of the dyconv machinery (bank aggregation + per-sample
    # GEMMs + grouped depthwise fold) inside an otherwise-fp32 model:
    # - "model": follow the model dtype (default)
    # - "bfloat16": banks/attention/activations cast to bf16 for the mix
    #   and the conv, ACCUMULATED fp32 (preferred_element_type) — halves
    #   the K=4 bank read traffic and uses the bf16 MXU path while params,
    #   BN and the optimizer stay fp32 (VERDICT r4 #5 experiment)
    dyconv_compute: str = "model"
    use_dy_blocks: str = "all"  # all | replace_se
    reduced_tail: bool = False
    dilated: bool = False
    in_conv_kernel: int = 3
    in_conv_stride: int = 2
    in_channels: int = 1
    dropout: float = 0.2
    # temperature schedule (T_max, T_min, T0_slope, T1_slope); with a
    # pretrained model T_max is the pretraining's final temperature
    # (models/dymn/model.py:336-342)
    t_max: float = 30.0
    t_min: float = 1.0
    t0_slope: float = 1.0
    t1_slope: float = 0.02
    # rematerialize block activations in the backward pass (jax.checkpoint)
    remat: bool = False

    def block_table(self):
        return mn_block_table(self.width_mult, self.reduced_tail, self.dilated,
                              self.strides)

    def dy_mask(self) -> Tuple[bool, ...]:
        if self.use_dy_blocks == "all":
            return (True,) * 15
        if self.use_dy_blocks == "replace_se":
            return _REPLACE_SE_MASK
        raise NotImplementedError(f"use_dy_blocks={self.use_dy_blocks}")

    def temperature(self, epoch: int) -> float:
        return dyconv_temperature(epoch, self.t_max, self.t_min,
                                  self.t0_slope, self.t1_slope)


class DyMN(nn.Module):
    cfg: DyMNConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, temperature=1.0, time_valid=None):
        """x: (B, F, T, C_in) -> (logits, embedding). ``temperature`` may be a
        python float or traced scalar; pass the per-epoch value from
        ``cfg.temperature(epoch)`` during training. ``time_valid`` (B,):
        valid INPUT mel frames; enables exact bucket-padded variable-length
        evaluation (padded frames re-zeroed before time-mixing ops and
        excluded from time-pooled means)."""
        cfg = self.cfg
        table, last_channel = cfg.block_table()
        dy_mask = cfg.dy_mask()

        tv = None
        if time_valid is not None:
            x = time_mask(x, time_valid)
            tv = conv_out_count(time_valid, cfg.in_conv_kernel, cfg.in_conv_stride)
        x = ConvNormAct(table[0].input_channels, cfg.in_conv_kernel,
                        cfg.in_conv_stride, dtype=self.dtype, name="stem")(x, train)
        # batch-minor residency (see DyMNConfig.layout): one transpose after
        # the stem and one before the tail replace 2 transposes per block
        ftbc = (cfg.layout == "ftbc" and time_valid is None
                and cfg.use_dy_blocks == "all" and not cfg.no_dyconv)
        layout = "ftbc" if ftbc else "nhwc"
        if ftbc:
            x = jnp.transpose(x, (1, 2, 0, 3))  # (B,F,T,C) -> (F,T,B,C)
        dy_cls = (nn.remat(DYBlock, static_argnums=(2,)) if cfg.remat
                  else DYBlock)
        static_cls = (nn.remat(InvertedResidual, static_argnums=(2,))
                      if cfg.remat else InvertedResidual)
        for i, cnf in enumerate(table):
            if dy_mask[i]:
                x = dy_cls(cnf, cfg.width_mult, cfg.context_ratio,
                           cfg.max_context_size, cfg.min_context_size,
                           cfg.dyrelu_k, cfg.dyconv_k, cfg.no_dyrelu,
                           cfg.no_dyconv, cfg.no_ca, cfg.pw_form,
                           layout=layout, dyconv_compute=cfg.dyconv_compute,
                           dtype=self.dtype,
                           name=f"block{i}")(x, train, temperature, tv)
            else:
                # static blocks in DyMN carry no SE (DynamicInvertedResidualConfig
                # hardwires use_se=False, dy_block.py:30)
                x = static_cls(cnf, se_dims=None, dtype=self.dtype,
                               name=f"block{i}")(x, train, tv)
            if tv is not None:
                stride = 1 if cnf.dilation > 1 else cnf.stride
                tv = conv_out_count(tv, cnf.kernel, stride, cnf.dilation)
        if ftbc:
            x = jnp.transpose(x, (2, 0, 1, 3))  # back to (B,F,T,C)
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
        else:
            raise NotImplementedError(
                f"Head '{cfg.head_type}' unknown. Must be one of: 'mlp', "
                f"'fully_convolutional'")
        return logits, embedding
