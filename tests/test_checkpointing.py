"""Full train-state checkpoint/resume + weight export (utils/checkpointing).

The reference has no resume path at all (ex_audioset.py:216-220 keeps only
the latest state_dict); these pin the beyond-reference contract: a restored
TrainState is bit-identical (params, batch stats, optimizer moments, step)
and keep-latest-k prunes old epochs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientat_tpu.models import MN, MNConfig
from efficientat_tpu.train.loop import (
    LossConfig, create_train_state, make_optimizer, make_train_step,
)
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.utils.checkpointing import (
    export_weights, latest_epoch, load_weights, restore_checkpoint,
    save_checkpoint,
)


def _tiny_state():
    model = MN(MNConfig(width_mult=0.1, num_classes=7))
    tx = make_optimizer(lambda step: 1e-3)
    return model, create_train_state(model, jax.random.PRNGKey(0), tx,
                                     input_shape=(1, 128, 50, 1))


# one compiled step per MODEL CONFIG shared by every _step call in this
# module: re-wrapping make_train_step's fresh closure in jax.jit defeats
# the jit cache, and on this 1-core host each avoidable recompile of the
# full train graph (mel + fwd/bwd + Adam) costs ~45 s of the fast tier.
# Keyed by the config so a future test with a different model cannot
# silently run the wrong train graph (ADVICE r4).
_JITTED_STEPS = {}


def _step(model, state, seed=0):
    key = model.cfg
    if key not in _JITTED_STEPS:
        mel_cfg = MelConfig(freqm=0, timem=0)
        _JITTED_STEPS[key] = jax.jit(make_train_step(
            model, mel_cfg, LossConfig(kind="bce", mixup_alpha=0.0)))
    _JITTED_STEP = _JITTED_STEPS[key]
    rng = np.random.default_rng(seed)
    batch = {
        "wave": rng.normal(size=(2, 16000)).astype(np.float32) * 0.1,
        "target": (rng.random((2, 7)) > 0.5).astype(np.float32),
    }
    state, _ = _JITTED_STEP(state, batch, jax.random.PRNGKey(seed),
                            jnp.float32(1.0))
    return state


def _assert_tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_save_restore_roundtrip_bit_identical(tmp_path):
    model, state = _tiny_state()
    state = _step(model, state, 1)  # non-trivial opt moments + BN stats
    save_checkpoint(str(tmp_path / "ck"), state, epoch=3)
    assert latest_epoch(str(tmp_path / "ck")) == 3

    _, fresh = _tiny_state()
    restored, next_epoch = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert next_epoch == 4
    assert int(restored.step) == int(state.step)
    _assert_tree_equal(restored.params, state.params)
    _assert_tree_equal(restored.batch_stats, state.batch_stats)
    _assert_tree_equal(restored.opt_state, state.opt_state)

    # resumed training continues identically to uninterrupted training
    cont_a = _step(model, state, 2)
    cont_b = _step(model, restored, 2)
    _assert_tree_equal(cont_a.params, cont_b.params)


def test_keep_latest_k_prunes(tmp_path):
    model, state = _tiny_state()
    for epoch in range(3):
        save_checkpoint(str(tmp_path / "ck"), state, epoch, keep=2)
    assert latest_epoch(str(tmp_path / "ck")) == 2
    import os
    kept = {d for d in os.listdir(tmp_path / "ck") if d.isdigit()}
    assert kept == {"1", "2"}


def test_restore_empty_dir_is_fresh_start(tmp_path):
    _, state = _tiny_state()
    restored, next_epoch = restore_checkpoint(str(tmp_path / "none"), state)
    assert next_epoch == 0
    assert restored is state


def test_export_load_weights_roundtrip(tmp_path):
    model, state = _tiny_state()
    state = _step(model, state, 5)
    p = str(tmp_path / "w" / "model.msgpack")
    export_weights(p, state.params, state.batch_stats)
    loaded = load_weights(p)
    _assert_tree_equal(loaded["params"], state.params)
    _assert_tree_equal(loaded["batch_stats"], state.batch_stats)
