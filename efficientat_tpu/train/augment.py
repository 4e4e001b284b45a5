"""Device-side batch augmentations (run inside the jitted train step).

- mixup: permutation + Beta(a,a) coefficients with lam=max(l, 1-l)
  (helpers/utils.py:90-95); applied to the mel spectrograms and targets
  exactly as the training loops do (ex_audioset.py:141-148).
- mixstyle: frequency-wise feature-statistics mixing for device
  generalization (helpers/utils.py:101-121, used by ex_dcase20.py:104-107).
  The reference computes stats over (channel, time) of NCHW; in NHWC that is
  axes (2, 3) -> per-(batch, frequency) statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_coefficients(rng: jax.Array, batch_size: int, alpha: float):
    """Returns (perm (B,), lam (B,)) with lam >= 0.5."""
    r_perm, r_beta = jax.random.split(rng)
    perm = jax.random.permutation(r_perm, batch_size)
    lam = jax.random.beta(r_beta, alpha, alpha, (batch_size,))
    lam = jnp.maximum(lam, 1.0 - lam)
    return perm, lam


def apply_mixup(x: jnp.ndarray, perm: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Convex-combine x with x[perm]; lam broadcasts over trailing dims."""
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    l = lam.reshape(shape)
    return x * l + x[perm] * (1.0 - l)


def mixstyle(x: jnp.ndarray, rng: jax.Array, p: float = 0.4, alpha: float = 0.4,
             eps: float = 1e-6) -> jnp.ndarray:
    """Frequency-wise MixStyle on NHWC (B, F, T, C) feature maps.

    With probability ``p`` (per batch), per-(B,F) mean/std are mixed with a
    permuted batch using Beta(alpha, alpha) convex weights. Gradients do not
    flow through the statistics (stop_gradient), matching the reference's
    ``.detach()``.
    """
    r_gate, r_lam, r_perm = jax.random.split(rng, 3)
    b = x.shape[0]

    mu = jnp.mean(x, axis=(2, 3), keepdims=True)        # (B, F, 1, 1)
    var = jnp.var(x, axis=(2, 3), keepdims=True, ddof=1)
    sig = jnp.sqrt(var + eps)
    mu = jax.lax.stop_gradient(mu)
    sig = jax.lax.stop_gradient(sig)

    x_normed = (x - mu) / sig
    lam = jax.random.beta(r_lam, alpha, alpha, (b, 1, 1, 1))
    perm = jax.random.permutation(r_perm, b)
    mu_mix = mu * lam + mu[perm] * (1.0 - lam)
    sig_mix = sig * lam + sig[perm] * (1.0 - lam)
    mixed = x_normed * sig_mix + mu_mix

    apply_it = jax.random.uniform(r_gate) <= p
    return jnp.where(apply_it, mixed, x)
