"""Micro-bench: dynamic POINTWISE conv formulations, esp. the b1 pathology.

Variants on (B,F,T,Ci) x per-sample (Ci,Co):
- einsum_bfti: einsum('bfti,bio->bfto')  (current impl)
- einsum_flat: reshape to (B, F*T, Ci) then einsum('bni,bio->bno')
- fgc_conv:    fold batch into feature groups, 1x1 conv fgc=B
- vmap_dot:    vmap over B of (F*T,Ci)@(Ci,Co)
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


def timed(fn, *args):
    fn(*args).block_until_ready()
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

    B = 64
    shapes = [
        ("b1exp", 64, 500, 16, 64),
        ("b2exp", 32, 250, 24, 72),
        ("b1proj", 32, 250, 64, 24),
        ("b11exp", 8, 63, 112, 672),
    ]
    rng = np.random.default_rng(0)

    for tag, f, t, ci, co in shapes:
        x = jnp.asarray(rng.normal(size=(B, f, t, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(B, ci, co)).astype(np.float32))

        @jax.jit
        def einsum_bfti(x, w):
            return jnp.sum(jnp.einsum("bfti,bio->bfto", x, w))

        @jax.jit
        def einsum_flat(x, w):
            b, ff, tt, c = x.shape
            y = jnp.einsum("bni,bio->bno", x.reshape(b, ff * tt, c), w)
            return jnp.sum(y)

        @jax.jit
        def fgc_conv(x, w):
            b, ff, tt, c = x.shape
            o = w.shape[-1]
            lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, ff, tt, b * c)
            # group g consumes lhs channels [g*c:(g+1)*c] and produces output
            # channels [g*o:(g+1)*o]; rhs is (1, 1, c, b*o)
            rhs = jnp.transpose(w, (1, 0, 2)).reshape(1, 1, c, b * o)
            out = lax.conv_general_dilated(
                lhs, rhs, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b)
            return jnp.sum(out)

        @jax.jit
        def vmap_dot(x, w):
            b, ff, tt, c = x.shape
            y = jax.vmap(lambda xb, wb: xb.reshape(ff * tt, c) @ wb)(x, w)
            return jnp.sum(y)

        res = {
            "einsum_bfti": timed(einsum_bfti, x, w),
            "einsum_flat": timed(einsum_flat, x, w),
            "fgc_conv": timed(fgc_conv, x, w),
            "vmap_dot": timed(vmap_dot, x, w),
        }
        print(json.dumps({"shape": tag, "dims": [f, t, ci, co],
                          **{k: round(v * 1e6) for k, v in res.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
