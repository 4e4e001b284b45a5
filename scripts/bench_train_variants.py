"""Train-step throughput: DyMN fine-tune step and mn40 large-batch remat.

Inputs staged on device (transfer overlaps compute via the prefetching
loader in real training; on this remote-tunnel dev box it would dominate).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SR = 32000


def measure(model, batch_size, tag, kd=False, iters=8):
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.ops.melspec import MelConfig
    from efficientat_tpu.train.loop import (
        LossConfig, create_train_state, jit_steps, make_eval_step,
        make_optimizer, make_train_step,
    )
    from efficientat_tpu.train.schedules import (
        exp_warmup_linear_down, per_epoch_schedule,
    )

    mel_cfg = MelConfig(freqm=48, timem=192)
    sched = per_epoch_schedule(exp_warmup_linear_down(8, 95, 80, 0.01),
                               8e-4, steps_per_epoch=833)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               make_optimizer(sched))
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3,
                          kd_lambda=0.1 if kd else 0.0)
    jt, _ = jit_steps(make_train_step(model, mel_cfg, loss_cfg),
                      make_eval_step(model, mel_cfg))
    rng = np.random.default_rng(0)
    batch = {
        "wave": rng.normal(size=(batch_size, 10 * SR)).astype(np.float32) * 0.1,
        "target": (rng.random((batch_size, 527)) > 0.98).astype(np.float32),
    }
    if kd:
        batch["teacher"] = rng.random((batch_size, 527)).astype(np.float32)
        batch["teacher_valid"] = np.ones((batch_size,), np.float32)
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)
    train_step = make_train_step(model, mel_cfg, loss_cfg)
    try:
        # loop steps ON DEVICE: one dispatch, one scalar fetch (remote-TPU
        # tunnel dispatch otherwise skews short steps)
        @jax.jit
        def run(state, batch, key, n):
            def body(i, carry):
                st, _ = carry
                st, m = train_step(st, batch, jax.random.fold_in(key, i),
                                   jnp.float32(1.0))
                return st, m["train_loss"]
            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

        t0 = time.perf_counter()
        _, loss = run(state, batch, key, 2)
        float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, loss = run(state, batch, key, iters)
        total = float(loss)
        dt = time.perf_counter() - t0
        assert np.isfinite(total)
        print(json.dumps({"case": tag, "batch": batch_size,
                          "clips_per_s": round(batch_size * iters / dt, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"case": tag, "batch": batch_size,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig

    which = sys.argv[1:] or ["dymn", "mn40", "mn40_remat"]
    if "mn10_bf16" in which:
        import jax.numpy as jnp
        measure(MN(MNConfig(), dtype=jnp.bfloat16), 120,
                "mn10 KD train step (bf16 compute)", kd=True)
    if "dymn" in which:
        measure(DyMN(DyMNConfig(t_max=1.0)), 64, "dymn10 train step (bce)")
    if "mn40" in which:
        measure(MN(MNConfig(width_mult=4.0)), 120, "mn40 KD train step", kd=True)
    if "mn40_remat" in which:
        cfg = dataclasses.replace(MNConfig(width_mult=4.0), remat=True)
        measure(MN(cfg), 120, "mn40 KD train step (remat)", kd=True)


if __name__ == "__main__":
    main()
