"""Batch-scaling probe for dymn10 serving: find why clips/s REGRESSES from
B=64 to B=256 while MN keeps improving (README perf table).

Two stages, run on the real chip:

1. op-level (``--ops``): per-clip time of each candidate op at B=64/256 —
   the 1x1 dynamic pointwise einsum, the dynamic depthwise grouped fold
   (plain and batch-chunked), and a DyReLU-style elementwise chain, at
   early/mid/late block shapes.
2. model-level (``--model``): per-clip time of the full dymn10 forward on a
   precomputed mel input, and of the no_dyconv / no_dyrelu / no_ca
   ablations, at B=64/256; plus the fused mel alone.

Measured 2026-08-17 (v5e, fp32 — see README "DyMN batch scaling"):
every probed op IMPROVES per-clip with batch in isolation (fold k3s2 C64:
78.7 -> 66.4 us, k5s1 C120: 57.0 -> 42.7, pointwise: 19.5 -> 8.4, mel:
88.6 -> 64.6), and chunking the fold at 64 samples is 5-20% SLOWER at
every shape — disproving the round-2 hypothesis that conv groups scaling
with B cause the cliff. The regression only appears in the composed model;
see the model-level stage for the ablation that isolates it.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from efficientat_tpu.utils.common import host_init


def _timeit(fn, *args, iters=12):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(n, *a):
        def body(i, acc):
            return acc + fn(*a, i.astype(jnp.float32) * 1e-7)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(2, *args))
    t0 = time.perf_counter()
    float(run(iters, *args))
    return (time.perf_counter() - t0) / iters


def probe_ops():
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models.dymn import (
        _dynamic_depthwise_fold, _dynamic_depthwise_local)

    rng = np.random.default_rng(0)
    cases = [
        ("pw 16->64 @64x500", "pw", (64, 500, 16, 64)),
        ("pw 960->960 @8x63", "pw", (8, 63, 960, 960)),
        ("dw k3s2 C64 @64x500", "dw", (64, 500, 64, 3, 2)),
        ("dw k5s1 C120 @32x250", "dw", (32, 250, 120, 5, 1)),
        ("dw k5s1 C960 @8x63", "dw", (8, 63, 960, 5, 1)),
        ("dyrelu C64 @64x500", "el", (64, 500, 64)),
    ]
    for B in (64, 256):
        print(f"== B={B}", flush=True)
        for name, kind, sh in cases:
            if kind == "pw":
                f, t, ci, co = sh
                x = jnp.asarray(rng.normal(size=(B, f * t, ci)).astype(np.float32))
                w = jnp.asarray(rng.normal(size=(B, ci, co)).astype(np.float32))
                dt = _timeit(lambda x, w, eps: jnp.sum(
                    jnp.einsum("bni,bio->bno", x + eps, w)), x, w)
            elif kind == "dw":
                f, t, c, ks, s = sh
                x = jnp.asarray(rng.normal(size=(B, f, t, c)).astype(np.float32))
                w = jnp.asarray(rng.normal(size=(B, ks, ks, c)).astype(np.float32))
                dt = _timeit(lambda x, w, eps: jnp.sum(
                    _dynamic_depthwise_fold(x + eps, w, ks, s, 1)), x, w)
                dtc = _timeit(lambda x, w, eps: jnp.sum(
                    _dynamic_depthwise_local(x + eps, w, ks, s, 1)), x, w)
                print(f"{name:26s} unchunked {dt/B*1e6:8.2f} us/clip  "
                      f"chunked {dtc/B*1e6:8.2f} us/clip", flush=True)
                continue
            else:
                f, t, c = sh
                x = jnp.asarray(rng.normal(size=(B, f, t, c)).astype(np.float32))
                a = jnp.asarray(rng.normal(size=(B, 1, 1, c)).astype(np.float32))
                dt = _timeit(lambda x, a, eps: jnp.sum(
                    jnp.maximum(x * a + eps, x * 0.5 + a)), x, a)
            print(f"{name:26s} {dt/B*1e6:8.2f} us/clip", flush=True)


def probe_model():
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    rng = np.random.default_rng(0)
    mel_cfg = MelConfig()
    for B in (64, 256):
        w = jnp.asarray(rng.normal(size=(B, 320000)).astype(np.float32) * 0.1)
        dt = _timeit(lambda w, eps: jnp.sum(
            log_mel_spectrogram_fused(w + eps, mel_cfg)), w)
        print(f"mel-only B={B}: {dt/B*1e6:.2f} us/clip", flush=True)

    for name, kw in [("full", {}), ("no_dyconv", {"no_dyconv": True}),
                     ("no_dyrelu", {"no_dyrelu": True}),
                     ("no_ca", {"no_ca": True})]:
        model = DyMN(DyMNConfig(t_max=1.0, **kw))
        variables = host_init(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 1000, 1), jnp.float32))
        for B in (64, 256):
            x = jnp.asarray(rng.normal(size=(B, 128, 1000, 1)).astype(np.float32))
            dt = _timeit(lambda v, x, eps: jnp.sum(
                model.apply(v, x + eps, False, 1.0)[0]), variables, x)
            print(f"model[{name}] B={B}: {dt/B*1e6:.2f} us/clip", flush=True)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if "--ops" in sys.argv or len(sys.argv) == 1:
        probe_ops()
    if "--model" in sys.argv or len(sys.argv) == 1:
        probe_model()
