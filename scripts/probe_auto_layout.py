"""Probe: does compiling the train step with AUTO parameter layouts
remove the per-step weight-relayout cost?

probe_train_overhead.py measured (MN KD, B=120, v5e): loop-carried
weights cost ~21 ms/step over closed-over weights (noopt 58.2 vs
noopt_carry 79.7) with the full step at ~131 ms — XLA keeps parameters
in the default HBM layout between steps and re-tiles them for the convs
every iteration. `jax.jit(..., in_shardings=Format(AutoLayout()))` lets
XLA choose the parameter layout for the STEP itself; with the state
donated, the output state keeps that layout, so the re-tiling should
happen once at device_put instead of every step.

Variants (each slope-timed over a host loop of donated steps):
  default      shipped jit(train_step, donate_argnums=0)
  auto_state   AUTO layouts on the train-state arg + state output
  model        mn10 | dymn10   (arg 1), B (arg 2), dtype (arg 3)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
           scripts/probe_auto_layout.py [mn10|dymn10] [B] [fp32|bf16]
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SR = 32000


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format
    from jax._src.layout import AutoLayout

    model_name = sys.argv[1] if len(sys.argv) > 1 else "mn10"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    dtype_s = sys.argv[3] if len(sys.argv) > 3 else "fp32"
    dtype = jnp.bfloat16 if dtype_s == "bf16" else jnp.float32

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.ops.melspec import MelConfig
    from efficientat_tpu.train.loop import (LossConfig, create_train_state,
                                            make_optimizer, make_train_step)
    from efficientat_tpu.train.schedules import (exp_warmup_linear_down,
                                                 per_epoch_schedule)

    mel_cfg = MelConfig(freqm=48, timem=192)
    if model_name.startswith("dymn"):
        model = DyMN(DyMNConfig(), dtype=dtype)
    else:
        model = MN(MNConfig(), dtype=dtype)
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
    temp = jnp.float32(1.0)

    train_step = make_train_step(model, mel_cfg, loss_cfg)

    def slope_time(step_fn, state0, iters=6):
        # the state is DONATED per step, so the chain flows forward and
        # never reuses a buffer; slope = (t_long - t_short)/(2*iters)
        # cancels the per-window dispatch/fetch constant.
        st = state0
        for i in range(2):
            st, m = step_fn(st, batch, jax.random.fold_in(key, i), temp)
        jax.block_until_ready(st.params)
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                st, m = step_fn(st, batch, jax.random.fold_in(key, i), temp)
            jax.block_until_ready(st.params)
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(3 * iters):
                st, m = step_fn(st, batch, jax.random.fold_in(key, i), temp)
            jax.block_until_ready(st.params)
            t_long = time.perf_counter() - t0
            dt = t_long - t_short
            if dt >= max(0.5, 0.2 * t_short):
                return dt / (2 * iters)
            iters *= 3
        return t_long / (3 * iters)

    out = {"model": model_name, "B": B, "dtype": dtype_s}

    state = create_train_state(model, jax.random.PRNGKey(0),
                               make_optimizer(sched))
    jit_default = jax.jit(train_step, donate_argnums=(0,))
    dt = slope_time(jit_default, state)
    out["default_ms"] = round(dt * 1e3, 2)
    out["default_clips_per_s"] = round(B / dt, 1)
    del jit_default

    state = create_train_state(model, jax.random.PRNGKey(0),
                               make_optimizer(sched))
    auto = Format(AutoLayout())
    jit_auto = jax.jit(train_step, donate_argnums=(0,),
                       in_shardings=(auto, None, None, None),
                       out_shardings=(auto, None))
    # resolve the chosen layouts, then device_put the state into them so
    # the first donated step already runs in the preferred layout.
    # AUTO-layout lowering requires abstract args (ShapeDtypeStructs) —
    # concrete jax.Arrays already carry a layout and are rejected.
    sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        (state, batch, key, temp))
    compiled = jit_auto.lower(*sds).compile()
    fmts = compiled.input_formats[0][0]
    state = jax.device_put(state, fmts)
    # call the COMPILED executable: re-calling the jit wrapper with
    # concrete arrays re-trips the AUTO-layout concrete-arg check
    dt = slope_time(compiled, state)
    out["auto_ms"] = round(dt * 1e3, 2)
    out["auto_clips_per_s"] = round(B / dt, 1)
    out["speedup_pct"] = round(
        100.0 * (out["default_ms"] / out["auto_ms"] - 1.0), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
