"""Device-chained micro-bench: DynamicConv lowerings across DyMN-10 shapes.

The DyMN ablation (bench_dymn.py float32,no_dyconv) shows DynamicConv is
~22.6 ms of the 34.7 ms B=64 batch — everything else in the DY block is
noise. This probes alternatives per shape:

pointwise (B,N,Ci) with per-sample attention att (B,K) over banks W (K,Ci,Co):
- pw_cur:  wb = att@W per sample, then batched einsum('bni,bio->bno')
- pw_allk: ONE static GEMM against all banks (Ci, K*Co), then mix outputs
           with att ('bnko,bk->bno') — static weights, 4x FLOPs
- pw_attx: fold att into the contraction: (B,N,K*Ci) @ (K*Ci, Co) —
           static weights, K*Ci contraction depth, 4x lhs traffic

depthwise (B,F,T,C), per-sample kernels from banks W (K,ks,ks,C):
- dw_cur:  per-sample mixed kernel, batch folded into groups (fgc=B*C)
- dw_cm:   ONE static depthwise conv with channel multiplier K
           (rhs (ks,ks,1,C*K), fgc=C), then mix outputs with att
- dw_mix4: K separate static depthwise convs, weighted sum of outputs

Prints ms per case and a summary of best-variant sums.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

B = 64
K = 4
ITERS = 32


def timed(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *args):
        def body(i, acc):
            return acc + fn(i.astype(jnp.float32) * 1e-7, *args)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(2, *args))
    t0 = time.perf_counter()
    total = float(run(iters, *args))
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return dt / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    # ---- pointwise shapes: (tag, F, T, Ci, Co) — DyMN-10 exp+proj convs
    pw_shapes = [
        ("b0proj", 64, 500, 16, 16),
        ("b1exp", 64, 500, 16, 64), ("b1proj", 32, 250, 64, 24),
        ("b2exp", 32, 250, 24, 72), ("b2proj", 32, 250, 72, 24),
        ("b3exp", 32, 250, 24, 72), ("b3proj", 16, 125, 72, 40),
        ("b4exp", 16, 125, 40, 120), ("b4proj", 16, 125, 120, 40),
        ("b6exp", 16, 125, 40, 240), ("b6proj", 8, 63, 240, 80),
        ("b7exp", 8, 63, 80, 200), ("b7proj", 8, 63, 200, 80),
        ("b8exp", 8, 63, 80, 184), ("b8proj", 8, 63, 184, 80),
        ("b10exp", 8, 63, 80, 480), ("b10proj", 8, 63, 480, 112),
        ("b11exp", 8, 63, 112, 672), ("b11proj", 8, 63, 672, 112),
        ("b12exp", 8, 63, 112, 672), ("b12proj", 4, 32, 672, 160),
        ("b13exp", 4, 32, 160, 960), ("b13proj", 4, 32, 960, 160),
        ("b14exp", 4, 32, 160, 960), ("b14proj", 4, 32, 960, 160),
    ]
    sums = {"pw_cur": 0.0, "pw_allk": 0.0, "pw_attx": 0.0}
    best_pw = 0.0
    for tag, f, t, ci, co in pw_shapes:
        n = f * t
        x = mk(B, n, ci)
        att = jax.nn.softmax(mk(B, K), axis=-1)
        w = mk(K, ci, co)

        def pw_cur(eps, x, att, w):
            wb = jnp.einsum("bk,kio->bio", att, w)
            return jnp.sum(jnp.einsum("bni,bio->bno", x + eps, wb))

        def pw_allk(eps, x, att, w):
            wf = jnp.transpose(w, (1, 0, 2)).reshape(ci, K * co)
            z = jnp.dot(x + eps, wf).reshape(B, n, K, co)
            return jnp.sum(jnp.einsum("bnko,bk->bno", z, att))

        def pw_attx(eps, x, att, w):
            xk = ((x + eps)[:, :, None, :] * att[:, None, :, None]).reshape(
                B, n, K * ci)
            return jnp.sum(jnp.dot(xk, w.reshape(K * ci, co)))

        row = {"shape": tag, "F": f, "T": t, "Ci": ci, "Co": co}
        times = {}
        for name, fn in [("pw_cur", pw_cur), ("pw_allk", pw_allk),
                         ("pw_attx", pw_attx)]:
            try:
                dt = timed(fn, x, att, w)
                times[name] = dt
                row[name + "_ms"] = round(dt * 1e3, 3)
                sums[name] += dt
            except Exception as e:
                row[name + "_ms"] = str(e)[:80]
        best_pw += min(times.values())
        print(json.dumps(row), flush=True)

    # ---- depthwise shapes: (tag, Fin, Tin, C, ks, stride)
    dw_shapes = [
        ("b0dw", 64, 500, 16, 3, 1),
        ("b1dw", 64, 500, 64, 3, 2),
        ("b2dw", 32, 250, 72, 3, 1),
        ("b3dw", 32, 250, 72, 5, 2),
        ("b4dw", 16, 125, 120, 5, 1),
        ("b6dw", 16, 125, 240, 5, 2),
        ("b7dw", 8, 63, 200, 3, 1),
        ("b8dw", 8, 63, 184, 3, 1),
        ("b10dw", 8, 63, 480, 3, 1),
        ("b11dw", 8, 63, 672, 3, 1),
        ("b12dw", 8, 63, 672, 5, 2),
        ("b13dw", 4, 32, 960, 5, 1),
    ]
    dsums = {"dw_cur": 0.0, "dw_cm": 0.0, "dw_mix4": 0.0}
    best_dw = 0.0
    for tag, f, t, c, ks, stride in dw_shapes:
        x = mk(B, f, t, c)
        att = jax.nn.softmax(mk(B, K), axis=-1)
        w = mk(K, ks, ks, c)
        p = (ks - 1) // 2

        def dw_cur(eps, x, att, w):
            wb = jnp.einsum("bk,kuvc->buvc", att, w)
            xx = x + eps
            b_, f_, t_, c_ = xx.shape
            lhs = jnp.transpose(xx, (1, 2, 0, 3)).reshape(1, f_, t_, b_ * c_)
            rhs = jnp.transpose(wb, (1, 2, 0, 3)).reshape(ks, ks, 1, b_ * c_)
            out = lax.conv_general_dilated(
                lhs, rhs, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b_ * c_)
            return jnp.sum(out)

        def dw_cm(eps, x, att, w):
            # one static conv, channel multiplier K: out ch c*K+k = W_k * x_c
            rhs = jnp.transpose(w, (1, 2, 0, 3))  # (ks,ks,K,c)
            rhs = jnp.transpose(rhs, (0, 1, 3, 2)).reshape(ks, ks, 1, c * K)
            out = lax.conv_general_dilated(
                x + eps, rhs, (stride, stride), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
            fo, to = out.shape[1], out.shape[2]
            out = out.reshape(B, fo, to, c, K)
            return jnp.sum(jnp.einsum("bftck,bk->bftc", out, att))

        def dw_mix4(eps, x, att, w):
            acc = None
            for k in range(K):
                rhs = w[k][..., None, :] * jnp.ones((1,), jnp.float32)
                rhs = w[k].reshape(ks, ks, 1, c)
                out = lax.conv_general_dilated(
                    x + eps, rhs, (stride, stride), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=c)
                term = out * att[:, None, None, k:k + 1]
                acc = term if acc is None else acc + term
            return jnp.sum(acc)

        row = {"shape": tag, "F": f, "T": t, "C": c, "ks": ks, "s": stride}
        times = {}
        for name, fn in [("dw_cur", dw_cur), ("dw_cm", dw_cm),
                         ("dw_mix4", dw_mix4)]:
            try:
                dt = timed(fn, x, att, w)
                times[name] = dt
                row[name + "_ms"] = round(dt * 1e3, 3)
                dsums[name] += dt
            except Exception as e:
                row[name + "_ms"] = str(e)[:80]
        best_dw += min(times.values())
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary_pw_ms": {k: round(v * 1e3, 2) for k, v in sums.items()},
                      "best_pw_ms": round(best_pw * 1e3, 2)}), flush=True)
    print(json.dumps({"summary_dw_ms": {k: round(v * 1e3, 2) for k, v in dsums.items()},
                      "best_dw_ms": round(best_dw * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
