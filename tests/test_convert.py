"""Checkpoint conversion parity: flax forward == torch-functional oracle.

These are the stand-in for downloadable-checkpoint parity (the build
environment is air-gapped): a reference-style state_dict is synthesized with
the exact key naming/shapes of the published checkpoints, converted with
efficientat_tpu.models.convert, and the NHWC flax forward is compared against
an independent NCHW torch-functional forward on the same weights.
"""

import json
import os

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


@pytest.mark.slow
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


@pytest.mark.slow
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
    from efficientat_tpu.models.convert import convert_mn

    cfg = MNConfig(width_mult=0.4, num_classes=11)
    sd = to_numpy_sd(make_mn_state_dict(cfg, seed=11))
    meaningful = [k for k in sd if "num_batches_tracked" not in k]
    variables = convert_mn(sd, cfg)
    flat_count = sum(1 for _ in jax.tree.leaves(variables))
    assert flat_count == len(meaningful)


def _mn_parity(cfg, seed, shape=(1, 1, 128, 32), rtol=1e-3, atol=1e-4):
    sd = make_mn_state_dict(cfg, seed=seed)
    variables = convert(to_numpy_sd(sd), cfg)
    model = MN(cfg)
    fresh = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 64, 1), jnp.float32))
    tree_shapes_match(jax.tree.map(np.shape, fresh["params"]),
                      jax.tree.map(np.shape, variables["params"]))
    x = np.random.default_rng(seed + 1).normal(size=shape).astype(np.float32) * 0.5
    with torch.no_grad():
        want_logits, want_emb = torch_mn_forward(sd, torch.tensor(x), cfg)
    got_logits, got_emb = model.apply(jax.tree.map(jnp.asarray, variables),
                                      jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_emb), want_emb.numpy(), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=rtol, atol=atol)


@pytest.mark.slow
def test_mn_mha_head_convert_matches_oracle():
    """models/mn/attention_pooling.py:9-56 conversion + forward parity."""
    cfg = MNConfig(width_mult=0.4, num_classes=9,
                   head_type="multihead_attention_pooling")
    _mn_parity(cfg, seed=20, shape=(2, 1, 128, 48))


@pytest.mark.parametrize("strides", [(2, 2, 2, 1), (2, 2, 1, 1)])
@pytest.mark.slow
def test_mn_fc_stride_variants_match_oracle(strides):
    """mn10_as_fc_s2221 / s2211 configs (models/mn/model.py:254-265)."""
    cfg = MNConfig(width_mult=0.4, num_classes=9, head_type="fully_convolutional",
                   strides=strides)
    _mn_parity(cfg, seed=21)


@pytest.mark.slow
def test_mn_reduced_tail_matches_oracle():
    cfg = MNConfig(width_mult=0.4, num_classes=9, reduced_tail=True)
    _mn_parity(cfg, seed=22)


@pytest.mark.slow
def test_mn_dilated_matches_oracle():
    """dilated=True: C4 blocks use dilation 2 with stride forced to 1
    (models/mn/model.py:241-265)."""
    cfg = MNConfig(width_mult=0.4, num_classes=9, dilated=True)
    _mn_parity(cfg, seed=23)


def test_mha_checkpoint_classes_and_surgery():
    cfg = MNConfig(width_mult=0.4, num_classes=17,
                   head_type="multihead_attention_pooling")
    sd = to_numpy_sd(make_mn_state_dict(cfg, seed=24))
    assert checkpoint_classes(sd, "multihead_attention_pooling") == 17
    # same class count -> head kept
    variables = convert(sd, cfg, drop_head=False)
    assert "head" in variables["params"]
    # mismatch -> dropped (fresh head grafted by load_pretrained)
    variables = convert(sd, MNConfig(width_mult=0.4, num_classes=5,
                                     head_type="multihead_attention_pooling"),
                        drop_head=True)
    assert "head" not in variables["params"]
    # mlp checkpoint loaded into an MHA config: class count unknown -> -1
    mlp_sd = to_numpy_sd(make_mn_state_dict(MNConfig(width_mult=0.4), seed=25))
    assert checkpoint_classes(mlp_sd, "multihead_attention_pooling") == -1


def test_every_registry_spec_converts_and_matches_init():
    """Each unique model config in the registry: synthesize a reference-style
    state_dict, convert it, and require an exact structure match with a fresh
    init (cheap eval_shape sweep; forward parity for each family is covered
    by the dedicated tests above)."""
    from efficientat_tpu.models.registry import REGISTRY, build_model

    seen = set()
    for name, spec in sorted(REGISTRY.items()):
        if spec.model_cfg in seen:
            continue
        seen.add(spec.model_cfg)
        model, _ = build_model(name)
        cfg = model.cfg
        make = make_dymn_state_dict if isinstance(cfg, DyMNConfig) else make_mn_state_dict
        variables = convert(to_numpy_sd(make(cfg, seed=30)), cfg)
        fresh = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 64, 1), jnp.float32))
        tree_shapes_match(jax.tree.map(np.shape, fresh["params"]),
                          jax.tree.map(np.shape, variables["params"]),
                          path=name)
        tree_shapes_match(jax.tree.map(np.shape, fresh["batch_stats"]),
                          jax.tree.map(np.shape, variables["batch_stats"]),
                          path=name)


@pytest.mark.slow
def test_file_level_checkpoint_pipeline(tmp_path):
    """The FULL on-disk checkpoint path, no network: torch.save a
    reference-style state_dict under the registry filename in a tmp
    MODEL_DIR, then load_pretrained (zip-format .pt parsing ->
    checkpoint_classes -> convert) and Tagger.predict end-to-end, asserting
    probability parity with the torch oracle on the same weights. The only
    unproven step of real-checkpoint parity left is the download itself
    (models/mn/model.py:282-313)."""
    from efficientat_tpu.infer.tag import Tagger
    from efficientat_tpu.models.convert import load_pretrained
    from efficientat_tpu.models.registry import build_model, get_model_config
    from efficientat_tpu.ops.melspec import log_mel_spectrogram

    name = "mn04_as"
    spec = get_model_config(name)
    ref_model, _ = build_model(name)
    sd = make_mn_state_dict(ref_model.cfg, seed=31)
    model_dir = tmp_path / "resources"
    model_dir.mkdir()
    torch.save(sd, str(model_dir / spec.file))  # default zip format

    model, variables, spec2 = load_pretrained(name, model_dir=str(model_dir))
    assert spec2.file == spec.file
    assert model.cfg.num_classes == 527

    wave = (np.random.default_rng(32).normal(size=32000) * 0.1).astype(np.float32)
    tagger = Tagger(name, pretrained=True, model_dir=str(model_dir))
    probs = tagger.predict(wave[None])
    assert probs.shape == (1, 527)

    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wave[None]), spec.mel_cfg))
    with torch.no_grad():
        want_logits, _ = torch_mn_forward(sd, torch.tensor(mel[:, None]),
                                          ref_model.cfg)
    want = torch.sigmoid(want_logits).numpy()
    np.testing.assert_allclose(probs, want, rtol=1e-3, atol=1e-4)

    # head surgery straight from the file: mismatched class count drops the
    # final classifier and grafts a fresh init (models/mn/model.py:292-310)
    model50, v50, _ = load_pretrained(name, num_classes=50,
                                      model_dir=str(model_dir))
    assert model50.cfg.num_classes == 50
    logits50, _ = model50.apply(v50, jnp.asarray(mel[..., None]))
    assert logits50.shape == (1, 50)
    # the backbone transferred: hidden-layer weights equal the checkpoint's
    hidden = np.asarray(v50["params"]["head"]["hidden"]["kernel"])
    np.testing.assert_allclose(hidden, sd["classifier.2.weight"].numpy().T,
                               rtol=1e-6)


def test_parity_check_script_offline_dry_run(tmp_path, capsys):
    """scripts/parity_check.py end-to-end with a LOCAL fake release file:
    the exact command the first networked minute will run, minus only the
    download (VERDICT r4 next #7). Exercises ensure_checkpoint (sha256
    manifest verification), conversion, the demo-clip forward, and the
    JSON report; a corrupted checksum must fail loudly."""
    import hashlib
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import parity_check

    name = "mn04_as"
    from efficientat_tpu.models.registry import build_model, get_model_config

    spec = get_model_config(name)
    ref_model, _ = build_model(name)
    sd = make_mn_state_dict(ref_model.cfg, seed=47)
    model_dir = tmp_path / "resources"
    model_dir.mkdir()
    pt = model_dir / spec.file
    torch.save(sd, str(pt))
    digest = hashlib.sha256(pt.read_bytes()).hexdigest()
    (model_dir / "checkpoints.sha256").write_text(f"{digest}  {spec.file}\n")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "report.json"
    rc = parity_check.run([
        "--model_name", name,
        "--model_dir", str(model_dir),
        "--audio_path", os.path.join(here, "assets", "demo_scene.wav"),
        "--out", str(out)])
    assert rc == 0  # mn04_as has no published golden -> recorded-only pass
    report = json.loads(out.read_text())
    assert report["checkpoint_sha256"] == digest
    assert len(report["top10"]) == 10
    assert "NO GOLDEN" in capsys.readouterr().out

    # a tampered manifest digest must refuse the file
    (model_dir / "checkpoints.sha256").write_text(f"{'0'*64}  {spec.file}\n")
    from efficientat_tpu.models.convert import ensure_checkpoint

    with pytest.raises(ValueError, match="checksum mismatch"):
        ensure_checkpoint(name, str(model_dir))
