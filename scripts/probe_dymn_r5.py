"""VERDICT r4 #5 experiments: push DyMN train past the roofline claim.

Rows (dymn10, full KD train step — mel + SpecAugment + mixup + fwd/bwd +
Adam, the bench.py dymn_train_step semantics):

- fp32_b120 / bf16_b120      — baselines (r3: 571 / 954; r5 composed bench
                               read 948 / 618 — the bf16 number needs a
                               clean standalone measure)
- bf16_b120_remat            — jax.checkpoint on every block
- bf16_b240[_remat]          — larger batch (VERDICT suggestion; the
                               batch-cliff note predicts a loss)
- bf16_b120_accum2x60        — 2 microbatches of 60 w/ grad accumulation,
                               per-microbatch BN (the reference's DDP
                               semantics at devices=2) — exploits dymn's
                               measured best-batch ~64
- fp32_b120_dyconv_bf16      — NEW DyMNConfig.dyconv_compute="bfloat16":
                               bank agg + per-sample GEMMs + depthwise fold
                               in bf16 with fp32 accumulation
- epilogue headroom (fwd-only): full dymn10 vs no_dyrelu+no_ca — bounds the
  maximum win of a Pallas epilogue fusing BN+DyReLU+CoordAtt onto the fold
  (if the ablated model is no faster, the epilogue is already fused by XLA
  and a Pallas kernel has nothing to recover)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dymn_r5.py [row ...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SR = 32000
CLIP = 10 * SR


def slope_rate(run, args, iters, units_per_iter, max_tries=4):
    """bench.py's two-point slope (t(3n)-t(n) cancels the tunnel round
    trip); best of two accepted pairs."""
    import jax  # noqa: F401

    t_long = iters_long = None
    best = None
    accepted = 0
    for _ in range(max_tries):
        t0 = time.perf_counter()
        total = float(run(*args, iters))
        t_short = time.perf_counter() - t0
        assert np.isfinite(total)
        t0 = time.perf_counter()
        total = float(run(*args, 3 * iters))
        t_long = time.perf_counter() - t0
        iters_long = 3 * iters
        assert np.isfinite(total)
        dt = t_long - t_short
        if dt >= max(1.0, 0.25 * t_short):
            rate = units_per_iter * (2 * iters) / dt
            best = rate if best is None else max(best, rate)
            accepted += 1
            if accepted == 2:
                return best, False
        else:
            iters *= 3
    if best is not None:
        return best, False
    return units_per_iter * iters_long / t_long, True


def _setup(batch, dtype, cfg_kw=None, accum=1):
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.melspec import MelConfig
    from efficientat_tpu.train.loop import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
    )
    from efficientat_tpu.train.schedules import (
        exp_warmup_linear_down, per_epoch_schedule,
    )

    cfg = DyMNConfig(t_max=30.0, **(cfg_kw or {}))
    model = DyMN(cfg, dtype=dtype)
    sched = per_epoch_schedule(exp_warmup_linear_down(8, 95, 80, 0.01),
                               8e-4, steps_per_epoch=833)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               make_optimizer(sched))
    mel_cfg = MelConfig(freqm=48, timem=192)
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3, kd_lambda=0.1)
    step = make_train_step(model, mel_cfg, loss_cfg)

    rng = np.random.default_rng(0)
    batch_data = jax.device_put({
        "wave": rng.normal(size=(batch, CLIP)).astype(np.float32) * 0.1,
        "target": (rng.random((batch, 527)) > 0.98).astype(np.float32),
        "teacher": rng.random((batch, 527)).astype(np.float32),
        "teacher_valid": np.ones((batch,), np.float32),
    })
    key = jax.random.PRNGKey(1)

    if accum > 1:
        # gradient accumulation over `accum` microbatches with
        # per-microbatch BN/optimizer-equivalent semantics approximated by
        # running the FULL step per microbatch (Adam per microbatch is NOT
        # the same optimizer math as one accumulated step; this row
        # measures the throughput ceiling of small-batch stepping, the
        # reference-DDP-shaped alternative)
        micro = batch // accum
        host = {
            "wave": rng.normal(size=(batch, CLIP)).astype(np.float32) * 0.1,
            "target": (rng.random((batch, 527)) > 0.98).astype(np.float32),
            "teacher": rng.random((batch, 527)).astype(np.float32),
            "teacher_valid": np.ones((batch,), np.float32),
        }
        stacked = jax.device_put(
            {k: v.reshape(accum, micro, *v.shape[1:]) for k, v in host.items()})

        @jax.jit
        def run(state, stacked, key, n):
            def body(i, carry):
                st, _ = carry
                def micro_body(j, inner):
                    st2, _ = inner
                    data = {k: v[j] for k, v in stacked.items()}
                    st2, m = step(st2, data,
                                  jax.random.fold_in(key, i * accum + j),
                                  jnp.float32(1.0))
                    return st2, m["train_loss"]
                return jax.lax.fori_loop(0, accum, micro_body, (st, jnp.float32(0.0)))
            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

        _, loss = run(state, stacked, key, 1)
        float(loss)
        return lambda s, b, k, n: run(s, b, k, n)[1], (state, stacked, key)

    @jax.jit
    def run(state, batch_data, key, n):
        def body(i, carry):
            st, _ = carry
            st, m = step(st, batch_data, jax.random.fold_in(key, i),
                         jnp.float32(1.0))
            return st, m["train_loss"]
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    _, loss = run(state, batch_data, key, 1)
    float(loss)
    return lambda s, b, k, n: run(s, b, k, n)[1], (state, batch_data, key)


def row_train(tag, batch, dtype_name, cfg_kw=None, accum=1, iters=6):
    import jax.numpy as jnp

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    t0 = time.perf_counter()
    try:
        run, args = _setup(batch, dtype, cfg_kw, accum)
        compile_s = time.perf_counter() - t0
        rate, fb = slope_rate(run, args, iters, batch)
        print(json.dumps({"row": tag, "batch": batch,
                          "clips_per_s": round(rate, 1),
                          "lower_bound": fb,
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"row": tag,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)


def row_fwd_epilogue(batch=120, iters=12):
    """Fwd-only: full dymn10 vs no_dyrelu+no_ca (bf16). The delta bounds a
    Pallas BN+DyReLU+CoordAtt epilogue's possible win."""
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.utils.common import host_init

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.normal(size=(batch, 128, 1000, 1)).astype(np.float32))
    for tag, kw in [("full", {}),
                    ("no_dyrelu_no_ca", {"no_dyrelu": True, "no_ca": True})]:
        try:
            model = DyMN(DyMNConfig(t_max=1.0, **kw), dtype=jnp.bfloat16)
            v = host_init(model, jax.random.PRNGKey(0),
                          np.zeros((1, 128, 1000, 1), np.float32))
            v = jax.device_put(v)

            @jax.jit
            def run(v, x, n):
                def body(i, acc):
                    logits, _ = model.apply(
                        v, x + i.astype(jnp.float32) * 1e-7, False,
                        jnp.float32(1.0))
                    return acc + jnp.sum(logits.astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(run(v, x, 1))
            rate, fb = slope_rate(run, (v, x), iters, batch)
            print(json.dumps({"row": f"fwd_bf16_{tag}", "batch": batch,
                              "clips_per_s": round(rate, 1),
                              "lower_bound": fb}), flush=True)
        except Exception as e:
            print(json.dumps({"row": f"fwd_bf16_{tag}",
                              "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    which = sys.argv[1:] or ["fp32_b120", "bf16_b120", "bf16_b120_remat",
                             "bf16_b240_remat", "bf16_b240",
                             "accum", "mix", "epilogue"]
    if "fp32_b120" in which:
        row_train("fp32_b120", 120, "fp32")
    if "bf16_b120" in which:
        row_train("bf16_b120", 120, "bf16")
    if "bf16_b120_remat" in which:
        row_train("bf16_b120_remat", 120, "bf16", {"remat": True})
    if "bf16_b240_remat" in which:
        row_train("bf16_b240_remat", 240, "bf16", {"remat": True})
    if "bf16_b240" in which:
        row_train("bf16_b240", 240, "bf16")
    if "accum" in which:
        row_train("bf16_b120_accum2x60", 120, "bf16", accum=2)
    if "mix" in which:
        row_train("fp32_b120_dyconv_bf16", 120, "fp32",
                  {"dyconv_compute": "bfloat16"})
    if "epilogue" in which:
        row_fwd_epilogue()


if __name__ == "__main__":
    main()
