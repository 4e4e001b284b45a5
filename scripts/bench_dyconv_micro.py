"""Micro-bench: dynamic-conv formulations at representative DyMN shapes.

Compares, per shape:
- pw_dyn:   per-sample pointwise einsum  (B,F,T,Ci) x (B,Ci,Co)
- pw_static: shared-weight 1x1 (one matmul)
- dw_dyn_shift: per-sample depthwise via unrolled shift-and-add
- dw_dyn_bgc: per-sample depthwise via conv_general_dilated batch_group_count
- dw_static: shared-weight depthwise conv
Prints one JSON line per (shape, variant).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ITERS = 30


def timed(fn, *args):
    import jax

    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    # chain: accumulate a scalar to force sequential execution, fetch once
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(ITERS):
        acc = acc + fn(*args)
    total = float(acc)
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return dt / ITERS


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # The round-1 shift-and-add lowering, inlined verbatim so this script
    # keeps measuring it after models/dymn.py switched to the grouped-conv
    # fold (the numbers cited there come from THIS comparison).
    def _dynamic_depthwise(x, w, ks, stride, dilation):
        b, f, t, c = x.shape
        p = (ks - 1) // 2 * dilation
        fo = (f + 2 * p - dilation * (ks - 1) - 1) // stride + 1
        to = (t + 2 * p - dilation * (ks - 1) - 1) // stride + 1
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        out = jnp.zeros((b, fo, to, c), dtype=x.dtype)
        for di in range(ks):
            for dj in range(ks):
                patch = lax.slice(
                    xp,
                    (0, di * dilation, dj * dilation, 0),
                    (b, di * dilation + (fo - 1) * stride + 1,
                     dj * dilation + (to - 1) * stride + 1, c),
                    (1, stride, stride, 1),
                )
                out = out + patch * w[:, di, dj, :][:, None, None, :]
        return out

    B = 64
    # (tag, F, T, Ci, Co, ks, stride) — block1-ish, block3-ish, block11-ish
    shapes = [
        ("b1", 64, 500, 16, 64, 3, 2),
        ("b3", 32, 250, 24, 72, 5, 2),
        ("b6", 16, 125, 40, 240, 3, 2),
        ("b11", 8, 63, 112, 672, 3, 1),
        ("b13", 4, 32, 160, 960, 5, 1),
    ]
    rng = np.random.default_rng(0)

    for tag, f, t, ci, co, ks, stride in shapes:
        x = jnp.asarray(rng.normal(size=(B, f, t, ci)).astype(np.float32))
        xe = jnp.asarray(rng.normal(size=(B, f, t, co)).astype(np.float32))
        w_pw_d = jnp.asarray(rng.normal(size=(B, ci, co)).astype(np.float32))
        w_pw_s = jnp.asarray(rng.normal(size=(ci, co)).astype(np.float32))
        w_dw_d = jnp.asarray(rng.normal(size=(B, ks, ks, co)).astype(np.float32))
        w_dw_s = jnp.asarray(rng.normal(size=(ks, ks, 1, co)).astype(np.float32))

        @jax.jit
        def pw_dyn(x, w):
            return jnp.sum(jnp.einsum("bfti,bio->bfto", x, w))

        @jax.jit
        def pw_static(x, w):
            return jnp.sum(jnp.einsum("bfti,io->bfto", x, w))

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def dw_dyn_shift(x, w, ks, stride):
            return jnp.sum(_dynamic_depthwise(x, w, ks, stride, 1))

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def dw_dyn_bgc(x, w, ks, stride):
            # batch_group_count path: per-sample depthwise kernels as one conv
            b, ff, tt, c = x.shape
            p = (ks - 1) // 2
            # lhs (1, F, T, B*C): batch folded into features
            lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, ff, tt, b * c)
            # rhs (ks, ks, 1, B*C)
            rhs = jnp.transpose(w, (1, 2, 0, 3)).reshape(ks, ks, 1, b * c)
            out = lax.conv_general_dilated(
                lhs, rhs, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b * c)
            fo = out.shape[1]
            to = out.shape[2]
            return jnp.sum(out.reshape(fo, to, b, c))

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def dw_static(x, w, ks, stride):
            p = (ks - 1) // 2
            return jnp.sum(lax.conv_general_dilated(
                x, w, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1]))

        res = {
            "pw_dyn": timed(pw_dyn, x, w_pw_d),
            "pw_static": timed(pw_static, x, w_pw_s),
            "dw_dyn_shift": timed(dw_dyn_shift, xe, w_dw_d, ks, stride),
            "dw_dyn_bgc": timed(dw_dyn_bgc, xe, w_dw_d, ks, stride),
            "dw_static": timed(dw_static, xe, w_dw_s, ks, stride),
        }
        print(json.dumps({"shape": tag, "dims": [f, t, ci, co, ks, stride],
                          **{k: round(v * 1e6) for k, v in res.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
