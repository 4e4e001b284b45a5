"""Where do the MN KD full-step's extra ~72 ms/step go? (r4 session)

Stage attribution (bench_train_stages.py, B=120, slope-timed) showed:
fwd_bwd 52.7 ms, mel+mixup+KD fwd_bwd WITHOUT optimizer 58.1 ms, but the
real train step 130.7 ms. The optimizer math (Adam on 4.9 M params) is
~0.1 ms of HBM traffic on paper, so something structural eats ~70 ms.

Variants (all slope-timed over device-chained fori_loops):
- noopt:       value_and_grad of the full input pipeline, params CLOSED
               OVER (loop-invariant weights — XLA may hoist weight-derived
               relayouts/fusions out of the loop)
- noopt_carry: same, but params are loop-carried and perturbed per
               iteration (p - 1e-6 g) — weights change every step like real
               training, but no optax/TrainState machinery
- full_sgd:    the real train step with optax.sgd
- full_adam:   the real train step (baseline)

Interpretation: noopt_carry >> noopt => the cost is inherent to
weight-updating loops (per-iteration weight layout/fusion work), not the
optimizer; full_sgd ≈ full_adam confirms it. Each program's
cost_analysis() FLOPs is printed so recompute (vs memory/layout) shows up.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SR = 32000
B = 120
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig
    from efficientat_tpu.train.augment import apply_mixup, mixup_coefficients
    from efficientat_tpu.train.loop import (
        LossConfig, create_train_state, make_optimizer, make_train_step,
        _model_forward, _task_loss,
    )
    from efficientat_tpu.train.schedules import (
        exp_warmup_linear_down, per_epoch_schedule,
    )

    mel_cfg = MelConfig(freqm=48, timem=192)
    model = MN(MNConfig())
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3, kd_lambda=0.1)
    sched = per_epoch_schedule(exp_warmup_linear_down(8, 95, 80, 0.01),
                               8e-4, steps_per_epoch=833)

    rng = np.random.default_rng(0)
    batch = {
        "wave": rng.normal(size=(B, 10 * SR)).astype(np.float32) * 0.1,
        "target": (rng.random((B, 527)) > 0.98).astype(np.float32),
        "teacher": rng.random((B, 527)).astype(np.float32),
        "teacher_valid": np.ones((B,), np.float32),
    }
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    def timed(body_fn, carry0, iters=ITERS):
        @jax.jit
        def run(n, carry0):
            return jax.lax.fori_loop(0, n, body_fn, carry0)
        lowered = jax.jit(run).lower(2, carry0)
        try:
            flops = lowered.compile().cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        jax.block_until_ready(run(2, carry0))
        iters_l = iters
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(iters_l, carry0))
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(run(3 * iters_l, carry0))
            t_long = time.perf_counter() - t0
            dt = t_long - t_short
            if dt >= max(0.5, 0.2 * t_short):
                return dt / (2 * iters_l), flops
            iters_l *= 3
        return t_long / (3 * iters_l), flops

    def loss_all(params, i):
        r = jax.random.fold_in(key, i)
        r_mel, r_mix, r_drop = jax.random.split(r, 3)
        mel = log_mel_spectrogram_fused(batch["wave"], mel_cfg, training=True,
                                        rng=r_mel)
        x = mel[..., None]
        perm, lam = mixup_coefficients(r_mix, x.shape[0], loss_cfg.mixup_alpha)
        x = apply_mixup(x, perm, lam)
        state0 = _STATE
        logits, _, _ = _model_forward(model, params, state0.batch_stats,
                                      x, True, 1.0, r_drop)
        loss, _ = _task_loss(loss_cfg, logits, batch, perm, lam)
        return loss

    global _STATE
    _STATE = create_train_state(model, jax.random.PRNGKey(0),
                                make_optimizer(sched))

    gall = jax.value_and_grad(loss_all)

    def noopt_body(i, acc):
        loss, grads = gall(_STATE.params, i)
        return acc + loss + jax.tree.leaves(grads)[0].ravel()[0]

    dt, fl = timed(noopt_body, jnp.float32(0.0))
    print(json.dumps({"variant": "noopt", "ms": round(dt * 1e3, 2),
                      "gflops_program": None if np.isnan(fl) else
                      round(fl / 1e9, 1)}), flush=True)

    def carry_body(i, carry):
        params, acc = carry
        loss, grads = gall(params, i)
        params = jax.tree.map(lambda p, g: p - 1e-6 * g, params, grads)
        return params, acc + loss

    dt, fl = timed(carry_body, (_STATE.params, jnp.float32(0.0)))
    print(json.dumps({"variant": "noopt_carry", "ms": round(dt * 1e3, 2),
                      "gflops_program": None if np.isnan(fl) else
                      round(fl / 1e9, 1)}), flush=True)

    for name, tx in (("full_sgd", optax.sgd(1e-4)),
                     ("full_adam", make_optimizer(sched))):
        state = create_train_state(model, jax.random.PRNGKey(0), tx)
        train_step = make_train_step(model, mel_cfg, loss_cfg)

        def full_body(i, carry):
            st, _ = carry
            st, m = train_step(st, batch, jax.random.fold_in(key, i),
                               jnp.float32(1.0))
            return st, m["train_loss"]

        dt, fl = timed(full_body, (state, jnp.float32(0.0)))
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "clips_per_s": round(B / dt, 1),
                          "gflops_program": None if np.isnan(fl) else
                          round(fl / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
