"""Probe: does a larger serving batch recover the bf16 headroom?

docs/DESIGN.md (r5 MFU table) reads mn10 bf16 B=64 at 48% of its
(halved-traffic) HBM floor while fp32 sits at 95% of its own — i.e. the
bf16 variant has left the bandwidth roofline and is limited by per-layer
overheads / VPU work that a bigger batch may amortize. This measures the
one untried knob: batch size, fp32 and bf16, B=64/128/256.

Run on the TPU:  python scripts/probe_mn_bf16_batch.py
Appends one JSON line per point to scripts/probe_mn_bf16_batch.out.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import bench  # noqa: E402  (reuses _setup_jax_cache + slope timing)


def measure(batch: int, bf16: bool) -> float:
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig
    from efficientat_tpu.utils.common import host_init

    mel_cfg = MelConfig()
    model = MN(MNConfig(), dtype=jnp.bfloat16 if bf16 else jnp.float32)
    variables = host_init(model, jax.random.PRNGKey(0),
                          jnp.zeros((1, 128, 1000, 1), jnp.float32))

    def fwd(variables, waves, eps):
        mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
        logits, _ = model.apply(variables, mel[..., None])
        return jnp.sum(jax.nn.sigmoid(logits.astype(jnp.float32)))

    # fewer iters at big batches: same total clips per timing run
    iters = max(4, (bench.ITERS * bench.BATCH) // batch)
    return bench._infer_cps(fwd, variables, batch=batch, iters=iters)


def main():
    bench._setup_jax_cache()
    out_path = os.path.join(HERE, "probe_mn_bf16_batch.out")
    with open(out_path, "a") as f:
        for batch in (64, 128, 256):
            for bf16 in (False, True):
                cps = measure(batch, bf16)
                rec = {"batch": batch, "dtype": "bf16" if bf16 else "fp32",
                       "clips_per_s": round(cps, 1)}
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")
                f.flush()


if __name__ == "__main__":
    main()
