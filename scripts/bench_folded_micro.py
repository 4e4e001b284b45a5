"""Micro-bench: DY-block ops in FOLDED layout (1, F, T, B*C) vs current.

Decides whether keeping the whole DyMN in the folded layout (eliminating
the per-dynamic-conv transposes) pays off:
- pw_einsum_t: current — einsum on (B,F,T,C) (input arrives folded, so
  includes unfold + refold transposes)
- pw_fgc_folded: grouped 1x1 conv directly on the folded layout
- dw_fgc_folded: grouped depthwise directly on folded (no transposes)
- dw_fgc_t: current — folded depthwise including unfold/refold transposes
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

ITERS = 20
B = 64


def timed(fn, *args):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(ITERS):
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

    shapes = [
        ("b1", 64, 500, 16, 64, 3, 2),
        ("b3", 32, 250, 24, 72, 5, 2),
        ("b6", 16, 125, 40, 240, 3, 2),
        ("b11", 8, 63, 112, 672, 3, 1),
        ("b13", 4, 32, 160, 960, 5, 1),
    ]
    rng = np.random.default_rng(0)

    for tag, f, t, ci, co, ks, stride in shapes:
        xf = jnp.asarray(rng.normal(size=(1, f, t, B * ci)).astype(np.float32))
        xef = jnp.asarray(rng.normal(size=(1, f, t, B * co)).astype(np.float32))
        w_pw = jnp.asarray(rng.normal(size=(B, ci, co)).astype(np.float32))
        w_dw = jnp.asarray(rng.normal(size=(B, ks, ks, co)).astype(np.float32))

        @jax.jit
        def pw_einsum_t(xf, w):
            x = jnp.transpose(xf.reshape(f, t, B, ci), (2, 0, 1, 3))
            y = jnp.einsum("bni,bio->bno", x.reshape(B, f * t, ci), w)
            y = y.reshape(B, f, t, co)
            return jnp.sum(jnp.transpose(y, (1, 2, 0, 3)).reshape(1, f, t, B * co))

        @jax.jit
        def pw_fgc_folded(xf, w):
            rhs = jnp.transpose(w, (1, 0, 2)).reshape(1, 1, ci, B * co)
            out = lax.conv_general_dilated(
                xf, rhs, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B)
            return jnp.sum(out)

        @jax.jit
        def dw_fgc_folded(xef, w):
            p = (ks - 1) // 2
            rhs = jnp.transpose(w, (1, 2, 0, 3)).reshape(ks, ks, 1, B * co)
            out = lax.conv_general_dilated(
                xef, rhs, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * co)
            return jnp.sum(out)

        @jax.jit
        def dw_fgc_t(xef, w):
            x = jnp.transpose(xef.reshape(f, t, B, co), (2, 0, 1, 3))
            p = (ks - 1) // 2
            lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, f, t, B * co)
            rhs = jnp.transpose(w, (1, 2, 0, 3)).reshape(ks, ks, 1, B * co)
            out = lax.conv_general_dilated(
                lhs, rhs, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B * co)
            fo, to = out.shape[1], out.shape[2]
            y = jnp.transpose(out.reshape(fo, to, B, co), (2, 0, 1, 3))
            return jnp.sum(jnp.transpose(y, (1, 2, 0, 3)).reshape(1, fo, to, B * co))

        res = {
            "pw_einsum_t": timed(pw_einsum_t, xf, w_pw),
            "pw_fgc_folded": timed(pw_fgc_folded, xf, w_pw),
            "dw_fgc_folded": timed(dw_fgc_folded, xef, w_dw),
            "dw_fgc_t": timed(dw_fgc_t, xef, w_dw),
        }
        print(json.dumps({"shape": tag,
                          **{k: round(v * 1e6) for k, v in res.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
