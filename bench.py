"""Benchmark: 10s-clip inference throughput per TPU chip (mn10_as).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: clips/sec for the full pipeline (waveform -> log-mel -> MobileNetV3
  -> sigmoid) at batch 64 on the default JAX device.
- vs_baseline: speedup over a PyTorch-CPU baseline of the same model math
  (torch functional forward on the same weights + numpy FFT mel) — the
  reference's CPU deployment path. Cached in .bench_cpu_baseline.json.

Timing notes for this environment: the TPU is remote (axon tunnel);
``block_until_ready`` does not flush the remote pipeline, so timing chains
every iteration into a scalar accumulator and fetches it to host once. A
persistent compilation cache avoids re-paying the (minutes-slow) remote
compile across runs.

North-star target: >= 5x PyTorch-CPU throughput (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CLIP_SECONDS = 10
SR = 32000
BATCH = 64
ITERS = 16
HERE = os.path.dirname(os.path.abspath(__file__))
CPU_BASELINE_CACHE = os.path.join(HERE, ".bench_cpu_baseline.json")


def _setup_jax_cache():
    import jax

    cache_dir = os.path.join(HERE, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def measure_tpu(batch=BATCH, iters=ITERS) -> float:
    import jax
    import jax.numpy as jnp

    _setup_jax_cache()
    from efficientat_tpu.models import MN, MNConfig
    from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
    from efficientat_tpu.ops.melspec import MelConfig

    mel_cfg = MelConfig()
    model = MN(MNConfig())
    rng = np.random.default_rng(0)
    waves_np = rng.normal(size=(batch, CLIP_SECONDS * SR)).astype(np.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 1000, 1), jnp.float32))

    @jax.jit
    def forward(variables, waves, eps):
        mel = log_mel_spectrogram_fused(waves + eps, mel_cfg)
        logits, _ = model.apply(variables, mel[..., None])
        return jnp.sum(jax.nn.sigmoid(logits))

    waves = jnp.asarray(waves_np)
    # warmup: compile + one full execution, forced to host
    float(forward(variables, waves, jnp.float32(0.0)))

    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        # vary input each iter so no layer of the stack can dedup work;
        # chaining into `acc` on host would serialize, so accumulate on
        # device by keeping each scalar and summing at the end
        acc = acc + forward(variables, waves, jnp.float32(i) * 1e-7)
    total = float(acc)  # single host fetch flushes the pipeline
    dt = time.perf_counter() - t0
    assert np.isfinite(total)
    return batch * iters / dt


def measure_cpu_baseline(n_clips=4) -> float:
    """PyTorch-CPU pipeline on the same math (cached across runs)."""
    if os.path.exists(CPU_BASELINE_CACHE):
        with open(CPU_BASELINE_CACHE) as f:
            return json.load(f)["clips_per_sec"]

    import torch

    sys.path.insert(0, os.path.join(HERE, "tests"))
    from torch_oracle import make_mn_state_dict, torch_mn_forward

    from efficientat_tpu.models import MNConfig
    from efficientat_tpu.ops.filterbank import kaldi_mel_banks
    import scipy.signal

    cfg = MNConfig()
    sd = make_mn_state_dict(cfg, seed=0)

    window = np.zeros(1024, dtype=np.float32)
    window[112:912] = scipy.signal.get_window("hann", 800, fftbins=False)
    banks = np.asarray(kaldi_mel_banks(128, 1024, SR, 0.0, 15000.0))

    def mel_cpu(wave):
        x = wave[1:] - 0.97 * wave[:-1]
        xp = np.pad(x, 512, mode="reflect")
        frames = np.lib.stride_tricks.sliding_window_view(xp, 1024)[::320]
        spec = np.abs(np.fft.rfft(frames * window, axis=1)) ** 2
        mel = banks @ spec.T
        return (np.log(mel + 1e-5) + 4.5) / 5.0

    rng = np.random.default_rng(0)
    waves = rng.normal(size=(n_clips, CLIP_SECONDS * SR)).astype(np.float32) * 0.1
    with torch.no_grad():
        m = mel_cpu(waves[0])
        torch_mn_forward(sd, torch.tensor(m[None, None]), cfg)  # warmup
        t0 = time.perf_counter()
        for w in waves:
            m = mel_cpu(w)
            logits, _ = torch_mn_forward(sd, torch.tensor(m[None, None]), cfg)
            torch.sigmoid(logits)
        dt = time.perf_counter() - t0
    cps = n_clips / dt
    with open(CPU_BASELINE_CACHE, "w") as f:
        json.dump({"clips_per_sec": cps, "n_clips": n_clips}, f)
    return cps


def main():
    tpu_cps = measure_tpu()
    try:
        cpu_cps = measure_cpu_baseline()
        vs = tpu_cps / cpu_cps
    except Exception as e:
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(json.dumps({
        "metric": "10s-clip inferences/sec/chip (mn10_as, full pipeline)",
        "value": round(tpu_cps, 2),
        "unit": "clips/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
