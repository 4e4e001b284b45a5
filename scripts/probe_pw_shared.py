"""Probe: shared-weight GEMM forms of the dynamic POINTWISE conv, fwd+bwd.

The per-sample form (current model lowering) builds a per-sample kernel
``wb = att @ banks`` and runs a batched matmul ``bni,bio->bno`` — B small
GEMMs with a tiny contraction dim (Ci as low as 16), i.e. low MXU
utilization and no weight reuse across samples. Two algebraic rewrites
trade 4x FLOPs (K=4 banks) for ONE shared-weight GEMM:

- shared_in ("form A"): z[b,n,(k,i)] = att[b,k] * x[b,n,i]  (elementwise
  expand, K*Ci wide), then y = z @ W[(k,i),o]. Contraction dim K*Ci.
- shared_out ("form B"): u[b,n,(k,o)] = x @ W[k]  (one GEMM with K*Co
  output cols), then y[b,n,o] = sum_k att[b,k] u[b,n,k,o].

Identity: y[b,n,o] = sum_{k,i} att[b,k] x[b,n,i] W[k,i,o] for all three.

Timed fwd-only and value_and_grad (the train step is the optimization
target, VERDICT r2 #9) at the dymn10 pointwise shapes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ITERS = 20
K = 4


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

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    # (tag, F, T, Ci, Co) — dymn10 pointwise conv shapes (expand + project)
    shapes = [
        ("b1exp", 64, 500, 16, 64),
        ("b1proj", 32, 250, 64, 24),
        ("b2exp", 32, 250, 24, 72),
        ("b4exp", 16, 125, 40, 240),
        ("b4proj", 16, 125, 240, 40),
        ("b6exp", 16, 125, 80, 200),
        ("b6proj", 16, 125, 200, 80),
        ("b11exp", 8, 63, 112, 672),
        ("b11proj", 8, 63, 672, 160),
        ("b13exp", 4, 32, 160, 960),
        ("b13proj", 4, 32, 960, 160),
    ]
    rng = np.random.default_rng(0)

    for tag, f, t, ci, co in shapes:
        x = jnp.asarray(rng.normal(size=(B, f, t, ci)).astype(np.float32))
        att = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(B, K)).astype(np.float32)))
        w = jnp.asarray(rng.normal(size=(K, ci, co)).astype(np.float32) * 0.1)

        def per_sample(x, att, w):
            b, ff, tt, c = x.shape
            wb = jnp.einsum("bk,kio->bio", att, w)
            y = jnp.einsum("bni,bio->bno", x.reshape(b, ff * tt, c), wb)
            return y

        def shared_in(x, att, w):
            b, ff, tt, c = x.shape
            n = ff * tt
            z = att[:, None, :, None] * x.reshape(b, n, 1, c)  # (B,N,K,Ci)
            y = jnp.einsum("bnkc,kco->bno", z, w)
            return y

        def shared_out(x, att, w):
            b, ff, tt, c = x.shape
            n = ff * tt
            u = jnp.einsum("bni,kio->bnko", x.reshape(b, n, c), w)
            return jnp.einsum("bnko,bk->bno", u, att)

        row = {"shape": tag, "dims": [B, f, t, ci, co]}
        for name, fn in [("per_sample", per_sample), ("shared_in", shared_in),
                         ("shared_out", shared_out)]:
            fwd = jax.jit(lambda x, att, w, fn=fn: jnp.sum(fn(x, att, w)))

            def loss(args, fn=fn):
                x, att, w = args
                return jnp.sum(jnp.tanh(fn(x, att, w)))

            vg = jax.jit(lambda x, att, w, fn=fn: sum(
                jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(
                    jax.grad(lambda a: loss(a, fn))((x, att, w)))))
            row[name + "_fwd_us"] = round(timed(fwd, x, att, w) * 1e6)
            row[name + "_bwd_us"] = round(timed(vg, x, att, w) * 1e6)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
