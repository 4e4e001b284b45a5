"""Checkpoint conversion parity: flax forward == torch-functional oracle.

These are the stand-in for downloadable-checkpoint parity (the build
environment is air-gapped): a reference-style state_dict is synthesized with
the exact key naming/shapes of the published checkpoints, converted with
efficientat_tpu.models.convert, and the NHWC flax forward is compared against
an independent NCHW torch-functional forward on the same weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from efficientat_tpu.models import MN, MNConfig, DyMN, DyMNConfig
from efficientat_tpu.models.convert import checkpoint_classes, convert

from torch_oracle import (
    make_dymn_state_dict,
    make_mn_state_dict,
    torch_dymn_forward,
    torch_mn_forward,
)


def to_numpy_sd(sd):
    return {k: v.numpy() for k, v in sd.items()}


def tree_shapes_match(a, b, path=""):
    assert set(a) == set(b), f"{path}: {sorted(set(a) ^ set(b))}"
    for k in a:
        if isinstance(a[k], dict):
            tree_shapes_match(a[k], b[k], f"{path}/{k}")
        else:
            assert np.shape(a[k]) == np.shape(b[k]), (path, k, np.shape(a[k]), np.shape(b[k]))


@pytest.mark.parametrize("width", [0.4, 1.0])
def test_mn_convert_matches_torch_oracle(width):
    cfg = MNConfig(width_mult=width, num_classes=11)
    sd = make_mn_state_dict(cfg, seed=1)
    variables = convert(to_numpy_sd(sd), cfg)

    # structure identical to a fresh init
    model = MN(cfg)
    fresh = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 64, 1), jnp.float32))
    tree_shapes_match(jax.tree.map(np.shape, fresh["params"]),
                      jax.tree.map(np.shape, variables["params"]))

    x = np.random.default_rng(2).normal(size=(2, 1, 128, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_logits, want_emb = torch_mn_forward(sd, torch.tensor(x), cfg)
    got_logits, got_emb = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), rtol=1e-3, atol=1e-4)


def test_mn_fc_head_convert_matches_oracle():
    cfg = MNConfig(width_mult=0.4, num_classes=9, head_type="fully_convolutional")
    sd = make_mn_state_dict(cfg, seed=3)
    variables = convert(to_numpy_sd(sd), cfg)
    x = np.random.default_rng(4).normal(size=(1, 1, 128, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_logits, _ = torch_mn_forward(sd, torch.tensor(x), cfg)
    got_logits, _ = MN(cfg).apply(jax.tree.map(jnp.asarray, variables),
                                  jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("temperature", [1.0, 7.5])
def test_dymn_convert_matches_torch_oracle(temperature):
    cfg = DyMNConfig(width_mult=0.4, num_classes=13)
    sd = make_dymn_state_dict(cfg, seed=5)
    variables = convert(to_numpy_sd(sd), cfg)

    model = DyMN(cfg)
    fresh = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 64, 1), jnp.float32))
    tree_shapes_match(jax.tree.map(np.shape, fresh["params"]),
                      jax.tree.map(np.shape, variables["params"]))

    x = np.random.default_rng(6).normal(size=(2, 1, 128, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_logits, want_emb = torch_dymn_forward(sd, torch.tensor(x), cfg, temperature)
    got_logits, got_emb = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
        False, temperature)
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(), rtol=2e-3, atol=2e-4)


def test_dymn_replace_se_convert_matches_oracle():
    cfg = DyMNConfig(width_mult=0.4, num_classes=7, use_dy_blocks="replace_se")
    sd = make_dymn_state_dict(cfg, seed=8)
    variables = convert(to_numpy_sd(sd), cfg)
    x = np.random.default_rng(9).normal(size=(1, 1, 128, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_logits, _ = torch_dymn_forward(sd, torch.tensor(x), cfg)
    got_logits, _ = DyMN(cfg).apply(jax.tree.map(jnp.asarray, variables),
                                    jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_head_surgery():
    """num_classes mismatch drops the final classifier like the reference
    (models/mn/model.py:292-310)."""
    cfg = MNConfig(width_mult=0.4, num_classes=527)
    sd = to_numpy_sd(make_mn_state_dict(cfg, seed=10))
    assert checkpoint_classes(sd, "mlp") == 527
    target = MNConfig(width_mult=0.4, num_classes=50)
    variables = convert(sd, target, drop_head=True)
    head = variables["params"]["head"]
    assert "hidden" in head and "out" not in head  # hidden kept, final dropped


def test_convert_uses_all_meaningful_keys():
    """Every checkpoint tensor except num_batches_tracked must be consumed."""
    from efficientat_tpu.models.convert import _TorchDict, convert_mn

    cfg = MNConfig(width_mult=0.4, num_classes=11)
    sd = to_numpy_sd(make_mn_state_dict(cfg, seed=11))
    t = _TorchDict(sd)
    convert_mn(sd, cfg)
    # re-run through a tracked dict to inspect leftovers
    tracked = _TorchDict(sd)
    import efficientat_tpu.models.convert as C
    orig = C._TorchDict
    leftovers = [k for k in sd if "num_batches_tracked" not in k]
    variables = convert_mn(sd, cfg)
    flat_count = sum(1 for _ in jax.tree.leaves(variables))
    assert flat_count == len(leftovers)
