"""Complexity report CLI backend (reference: complexity.py:11-54)."""

from __future__ import annotations

from efficientat_tpu.models.registry import get_model_config
from efficientat_tpu.tools.macs import count_macs
from efficientat_tpu.tools.peak_memory import peak_memory_cnn, peak_memory_mnv3
from efficientat_tpu.models.mn import MNConfig


def report_complexity(model_name: str, measure: str = "macs", bits: int = 16,
                      clip_seconds: float = 10.0, memory_efficient: bool = True):
    spec = get_model_config(model_name)
    cfg = spec.model_cfg
    mel = spec.mel_cfg
    input_f = mel.n_mels
    input_t = mel.num_frames(int(clip_seconds * mel.sr))

    if measure == "macs":
        total = count_macs(cfg, input_f, input_t, verbose=True)
        # true param count from the real parameter tree
        import jax
        import jax.numpy as jnp
        import numpy as np

        from efficientat_tpu.models.registry import build_model

        model, _ = build_model(model_name)
        variables = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, input_f, 64, 1), jnp.float32))
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree.leaves(variables["params"]))
        print(f"Model '{model_name}' has {n_params / 1e6:.2f} million parameters "
              f"and inference of a single {clip_seconds:.0f}-seconds audio clip "
              f"requires {total / 1e9:.2f} billion multiply-accumulate operations.")
        return total
    if measure == "memory":
        if memory_efficient and isinstance(cfg, MNConfig):
            peak = peak_memory_mnv3(cfg, input_f, input_t, bits, verbose=True)
        else:
            peak = peak_memory_cnn(cfg, input_f, input_t, bits, verbose=True)
        print(f"Model '{model_name}' inference of a single {clip_seconds:.0f}-seconds "
              f"audio clip has a peak memory of {peak:.2f} kB.")
        return peak
    raise NotImplementedError(measure)
