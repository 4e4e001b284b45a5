"""Training-engine tests: schedules, augmentation, metrics, pjit'd steps."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from efficientat_tpu.models import MN, MNConfig, DyMN, DyMNConfig
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.parallel import make_mesh, shard_batch
from efficientat_tpu.parallel.mesh import replicate
from efficientat_tpu.train.augment import apply_mixup, mixstyle, mixup_coefficients
from efficientat_tpu.train.loop import (
    LossConfig,
    create_train_state,
    jit_steps,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from efficientat_tpu.train.metrics import accuracy, average_precision, macro_metrics, roc_auc
from efficientat_tpu.train.schedules import exp_warmup_linear_down, per_epoch_schedule


# --------------------------------------------------------------- schedules

def test_schedule_reference_values():
    # AudioSet defaults: warmup 8, rampdown 95 from epoch 80 to 0.01
    f = exp_warmup_linear_down(8, 95, 80, 0.01)
    # epoch 0 clips to 0.5: exp(-5 * (1 - 0.5/8)^2)
    assert f(0) == pytest.approx(math.exp(-5 * (1 - 0.5 / 8) ** 2))
    assert f(8) == 1.0
    assert f(50) == 1.0
    assert f(80) == 1.0
    # halfway down the ramp
    assert f(80 + 47.5) == pytest.approx(0.01 + 0.99 * 0.5)
    assert f(175) == pytest.approx(0.01)
    assert f(199) == pytest.approx(0.01)


def test_per_epoch_schedule_steps():
    f = exp_warmup_linear_down(8, 95, 80, 0.01)
    sched = per_epoch_schedule(f, base_lr=8e-4, steps_per_epoch=10)
    # constant within an epoch, jumps at epoch boundaries
    assert float(sched(0)) == float(sched(9))
    assert float(sched(10)) != float(sched(9))
    assert float(sched(85)) == pytest.approx(8e-4 * f(8))


# ------------------------------------------------------------- augmentation

def test_mixup_coefficients():
    perm, lam = mixup_coefficients(jax.random.PRNGKey(0), 64, 0.3)
    assert sorted(np.asarray(perm).tolist()) == list(range(64))
    lam = np.asarray(lam)
    assert np.all(lam >= 0.5) and np.all(lam <= 1.0)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 4, 4, 1)), jnp.float32)
    mixed = apply_mixup(x, perm, lam)
    want = np.asarray(x) * np.asarray(lam)[:, None, None, None] + \
        np.asarray(x)[np.asarray(perm)] * (1 - np.asarray(lam))[:, None, None, None]
    np.testing.assert_allclose(np.asarray(mixed), want, rtol=1e-6)


def test_mixstyle_gate_and_stats():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 16, 20, 3)), jnp.float32)
    # p=0 -> identity
    out0 = mixstyle(x, jax.random.PRNGKey(0), p=0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))
    # p=1 -> mixed, same shape, finite
    out1 = mixstyle(x, jax.random.PRNGKey(0), p=1.0)
    assert out1.shape == x.shape
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out1), np.asarray(x))


# ----------------------------------------------------------------- metrics

def test_metrics_match_sklearn():
    from sklearn.metrics import average_precision_score, roc_auc_score

    rng = np.random.default_rng(2)
    y = (rng.random((200, 5)) > 0.7).astype(np.float64)
    y[:, 0] = (rng.random(200) > 0.3)  # varied prevalence
    s = rng.random((200, 5)) * 0.5 + y * rng.random((200, 5)) * 0.5

    for c in range(5):
        np.testing.assert_allclose(
            average_precision(y[:, c], s[:, c]),
            average_precision_score(y[:, c], s[:, c]), rtol=1e-9)
        np.testing.assert_allclose(
            roc_auc(y[:, c], s[:, c]),
            roc_auc_score(y[:, c], s[:, c]), rtol=1e-9)

    m_ap, m_roc = macro_metrics(y, s)
    np.testing.assert_allclose(m_ap, average_precision_score(y, s, average="macro"), rtol=1e-9)
    np.testing.assert_allclose(m_roc, roc_auc_score(y, s, average="macro"), rtol=1e-9)


def test_metrics_with_sample_weight_match_sklearn():
    from sklearn.metrics import average_precision_score, roc_auc_score

    rng = np.random.default_rng(3)
    y = (rng.random(150) > 0.6).astype(np.float64)
    s = rng.random(150) * 0.6 + y * 0.3
    w = (rng.random(150) > 0.25).astype(np.float64)  # mask-style weights
    np.testing.assert_allclose(
        average_precision(y, s, w),
        average_precision_score(y, s, sample_weight=w), rtol=1e-9)
    np.testing.assert_allclose(
        roc_auc(y, s, w), roc_auc_score(y, s, sample_weight=w), rtol=1e-9)


def test_accuracy():
    y = np.array([0, 1, 2, 1])
    s = np.eye(3)[[0, 1, 1, 1]]
    assert accuracy(y, s) == 0.75


# -------------------------------------------------------------- train steps

MEL = MelConfig(freqm=8, timem=16)
WAVE_LEN = 32000  # 100 frames


def tiny_state(model, lr=1e-3):
    tx = make_optimizer(lr)
    return create_train_state(model, jax.random.PRNGKey(0), tx,
                              input_shape=(1, 128, MEL.num_frames(WAVE_LEN), 1))


@pytest.mark.slow
def test_train_step_bce_kd_on_mesh():
    model = MN(MNConfig(width_mult=0.4, num_classes=10))
    state = tiny_state(model)
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3, kd_lambda=0.1)
    train_step = make_train_step(model, MEL, loss_cfg)

    mesh = make_mesh(8)
    jt, _ = jit_steps(train_step, make_eval_step(model, MEL), mesh,
                      donate_state=False)

    rng = np.random.default_rng(4)
    batch = {
        "wave": rng.normal(size=(8, WAVE_LEN)).astype(np.float32) * 0.1,
        "target": (rng.random((8, 10)) > 0.8).astype(np.float32),
        "teacher": rng.random((8, 10)).astype(np.float32),
        "teacher_valid": np.array([1, 1, 1, 0, 1, 1, 1, 1], np.float32),
    }
    batch = shard_batch(batch, mesh)
    state_r = replicate(state, mesh)

    new_state, metrics = jt(state_r, batch, jax.random.PRNGKey(1), jnp.float32(1.0))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train_loss"]))
    assert "distillation_loss" in metrics
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_dymn_on_mesh_matches_single_device():
    """DyMN under the 8-device data-parallel mesh must produce the same
    logits and train loss as one device: the dynamic depthwise fold merges
    batch into conv groups, which is only correct/fast per batch shard —
    the shard_map lowering (models/dymn.py::_dynamic_depthwise) localizes
    it. Mirrors the reference training dymn under DDP like any model
    (ex_pl_audioset.py:287-296)."""
    model = DyMN(DyMNConfig(width_mult=0.4, num_classes=10, t_max=1.0))
    # SGD, not Adam: Adam normalizes by sqrt(v), so a float-epsilon grad
    # difference (all-reduce summation order) flips the sign of near-zero
    # updates and shows up as a spurious 2*lr param mismatch; with SGD the
    # param delta stays proportional to the actual grad difference.
    state = create_train_state(model, jax.random.PRNGKey(0), optax.sgd(1e-3),
                               input_shape=(1, 128, MEL.num_frames(WAVE_LEN), 1))
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3, kd_lambda=0.1)

    rng = np.random.default_rng(7)
    batch = {
        "wave": rng.normal(size=(8, WAVE_LEN)).astype(np.float32) * 0.1,
        "target": (rng.random((8, 10)) > 0.8).astype(np.float32),
        "teacher": rng.random((8, 10)).astype(np.float32),
        "teacher_valid": np.ones((8,), np.float32),
    }
    temp = jnp.float32(1.0)
    key = jax.random.PRNGKey(3)

    # single device
    ts1 = make_train_step(model, MEL, loss_cfg)
    es1 = make_eval_step(model, MEL)
    s1, m1 = jax.jit(ts1, donate_argnums=())(state, batch, key, temp)
    logits1 = np.asarray(jax.jit(es1)(state, batch["wave"], temp))

    # 8-device mesh
    mesh = make_mesh(8)
    jt, je = jit_steps(make_train_step(model, MEL, loss_cfg, mesh),
                       make_eval_step(model, MEL, mesh), mesh,
                       donate_state=False)
    batch_m = shard_batch(batch, mesh)
    state_m = replicate(state, mesh)
    s8, m8 = jt(state_m, batch_m, key, temp)
    logits8 = np.asarray(je(state_m, batch_m["wave"], temp))

    np.testing.assert_allclose(logits8, logits1, rtol=1e-4, atol=1e-5)
    assert abs(float(m8["train_loss"]) - float(m1["train_loss"])) < 1e-5
    # updated params agree too (grad all-reduce == single-device grads)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_ce_and_masked_bce():
    model = MN(MNConfig(width_mult=0.4, num_classes=6))
    state = tiny_state(model)
    rng = np.random.default_rng(5)
    wave = rng.normal(size=(4, WAVE_LEN)).astype(np.float32) * 0.1

    # cross-entropy (ESC-50 style, integer targets)
    ts = make_train_step(model, MEL, LossConfig(kind="ce", mixup_alpha=0.3))
    jt = jax.jit(ts, donate_argnums=())
    batch = {"wave": wave, "target": np.array([0, 3, 5, 1])}
    s1, m1 = jt(state, batch, jax.random.PRNGKey(0), jnp.float32(1.0))
    assert np.isfinite(float(m1["train_loss"]))

    # masked BCE (OpenMIC style: 3 classes + 3 mask bits)
    model3 = MN(MNConfig(width_mult=0.4, num_classes=3))
    state3 = tiny_state(model3)
    ts3 = make_train_step(model3, MEL, LossConfig(kind="masked_bce", mixup_alpha=0.3))
    batch3 = {"wave": wave,
              "target": np.concatenate([rng.random((4, 3)),
                                        (rng.random((4, 3)) > 0.5)], 1).astype(np.float32)}
    s3, m3 = jax.jit(ts3)(state3, batch3, jax.random.PRNGKey(0), jnp.float32(1.0))
    assert np.isfinite(float(m3["train_loss"]))


@pytest.mark.slow
def test_train_and_eval_dymn():
    model = DyMN(DyMNConfig(width_mult=0.4, num_classes=5))
    state = tiny_state(model)
    ts = make_train_step(model, MEL, LossConfig(kind="bce", mixup_alpha=0.0))
    es = make_eval_step(model, MEL)
    rng = np.random.default_rng(6)
    batch = {"wave": rng.normal(size=(2, WAVE_LEN)).astype(np.float32) * 0.1,
             "target": (rng.random((2, 5)) > 0.5).astype(np.float32)}
    temp = jnp.float32(30.0)
    s1, m = jax.jit(ts)(state, batch, jax.random.PRNGKey(0), temp)
    assert np.isfinite(float(m["train_loss"]))
    logits = jax.jit(es)(s1, batch["wave"], temp)
    assert logits.shape == (2, 5)


def test_schedule_in_optimizer_moves_lr():
    f = exp_warmup_linear_down(2, 4, 2, 0.1)
    sched = per_epoch_schedule(f, 1e-3, steps_per_epoch=1)
    tx = make_optimizer(sched, weight_decay=1e-4)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    u1, opt_state = tx.update(g, opt_state, params)
    assert np.isfinite(np.asarray(u1["w"])).all()


def test_synthetic_teacher_store_is_process_stable():
    """Seeds must come from a stable digest, not Python's salted str hash,
    so synthetic-KD runs reproduce across processes."""
    import zlib

    from efficientat_tpu.train.kd import SyntheticTeacherStore

    store = SyntheticTeacherStore(527)
    rows, valid = store.lookup(["clipA", "clipB"])
    rows2, _ = SyntheticTeacherStore(527).lookup(["clipA", "clipB"])
    np.testing.assert_array_equal(rows, rows2)
    expected_seed = zlib.crc32(b"clipA\x00clipB")
    expected = np.random.default_rng(expected_seed).random((2, 527)).astype(np.float32)
    np.testing.assert_array_equal(rows, expected)
    np.testing.assert_array_equal(valid, np.ones(2, np.float32))


@pytest.mark.slow
def test_teacher_store_real_format(tmp_path):
    """TeacherStore on the reference's actual on-disk KD format
    (ex_audioset.py:104-118): a .npy of raw teacher LOGITS sharpened to
    sigmoid(logits/T) at load, plus a pickled fname->row-index dict;
    missing files get a zero row and valid=0, and a KD train step consumes
    the lookup end-to-end."""
    import pickle

    from efficientat_tpu.train.kd import TeacherStore

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(5, 10)).astype(np.float32) * 3.0
    preds_path = str(tmp_path / "passt_logits.npy")
    np.save(preds_path, logits)
    index = {f"clip{i}": i for i in range(5)}
    index_path = str(tmp_path / "fname_to_index.pkl")
    with open(index_path, "wb") as f:
        pickle.dump(index, f)

    store = TeacherStore(preds_path, index_path, temperature=2.0)
    assert store.num_classes == 10
    rows, valid = store.lookup(["clip3", "missing", "clip0"])
    expected3 = 1.0 / (1.0 + np.exp(-logits[3] / 2.0))
    np.testing.assert_allclose(rows[0], expected3, rtol=1e-6)
    np.testing.assert_array_equal(valid, [1.0, 0.0, 1.0])
    np.testing.assert_array_equal(rows[1], np.zeros(10, np.float32))

    # a miss must contribute zero soft loss: same batch, flip only the
    # missing row's teacher content — loss must not change
    model = MN(MNConfig(width_mult=0.4, num_classes=10))
    state = tiny_state(model)
    ts = jax.jit(make_train_step(
        model, MEL, LossConfig(kind="bce", mixup_alpha=0.0, kd_lambda=0.1)),
        donate_argnums=())
    wave = np.random.default_rng(3).normal(size=(3, WAVE_LEN)).astype(np.float32)
    target = (np.random.default_rng(4).random((3, 10)) > 0.8).astype(np.float32)
    rows2 = rows.copy()
    rows2[1] = 0.7  # garbage content on the missed row
    key, temp = jax.random.PRNGKey(0), jnp.float32(1.0)
    _, m1 = ts(state, {"wave": wave, "target": target, "teacher": rows,
                       "teacher_valid": valid}, key, temp)
    _, m2 = ts(state, {"wave": wave, "target": target, "teacher": rows2,
                       "teacher_valid": valid}, key, temp)
    assert np.isfinite(float(m1["train_loss"]))
    assert abs(float(m1["train_loss"]) - float(m2["train_loss"])) < 1e-7
    assert float(m1["distillation_loss"]) == float(m2["distillation_loss"])


@pytest.mark.slow
def test_training_converges_on_separable_task():
    """End-to-end learning signal: 30 steps on a class-separable synthetic
    batch must reduce the BCE loss several-fold and fit the labels (the
    other train tests only assert finite losses / moved params — this pins
    that mel + model + loss + Adam actually LEARN together)."""
    model = MN(MNConfig(width_mult=0.2, num_classes=4))
    state = tiny_state(model, lr=2e-3)
    train_step = make_train_step(
        model, MEL, LossConfig(kind="bce", mixup_alpha=0.0))
    jt = jax.jit(train_step)

    # four tones, one per class — trivially separable from the log-mel
    rng = np.random.default_rng(0)
    t = np.arange(WAVE_LEN) / 32000.0
    waves, targets = [], []
    for i in range(8):
        cls = i % 4
        f0 = [300.0, 800.0, 2000.0, 5000.0][cls]
        waves.append((0.3 * np.sin(2 * np.pi * f0 * t)
                      + 0.01 * rng.normal(size=WAVE_LEN)).astype(np.float32))
        onehot = np.zeros(4, np.float32)
        onehot[cls] = 1.0
        targets.append(onehot)
    batch = {"wave": np.stack(waves), "target": np.stack(targets)}

    losses = []
    for step in range(30):
        state, metrics = jt(state, batch, jax.random.PRNGKey(7),
                            jnp.float32(1.0))
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] / 3, (losses[0], losses[-1])


@pytest.mark.slow
def test_train_step_int16_wave_parity():
    """An int16 wave batch (data/hdf5.py int16_waves transport) must
    produce the same step as the dequantized float32 batch. The math is
    exact in fp32, but XLA may fuse the dequantize multiply into the first
    conv (different rounding order), which flips update signs for
    near-zero grads through Adam's normalizer — so assert the loss (the
    full fwd path) tightly rather than post-optimizer params."""
    model = MN(MNConfig(width_mult=0.4, num_classes=10))
    loss_cfg = LossConfig(kind="bce", mixup_alpha=0.3, kd_lambda=0.1)
    ts = jax.jit(make_train_step(model, MEL, loss_cfg))

    rng = np.random.default_rng(7)
    w16 = (rng.normal(size=(4, WAVE_LEN)) * 3000).astype(np.int16)
    base = {
        "target": (rng.random((4, 10)) > 0.8).astype(np.float32),
        "teacher": rng.random((4, 10)).astype(np.float32),
        "teacher_valid": np.ones(4, np.float32),
    }
    key = jax.random.PRNGKey(0)
    s1, m1 = ts(tiny_state(model), dict(base, wave=w16), key, jnp.float32(1.0))
    s2, m2 = ts(tiny_state(model),
                dict(base, wave=(w16.astype(np.float32) / 32768.0)),
                key, jnp.float32(1.0))
    np.testing.assert_allclose(float(m1["train_loss"]),
                               float(m2["train_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["label_loss"]),
                               float(m2["label_loss"]), rtol=1e-5)
    # params stay in the same ballpark (update magnitude ~lr)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


@pytest.mark.slow
def test_dymn_training_converges_on_separable_task():
    """DyMN end-to-end learning signal (the flagship family): 30 steps on
    a tone-separable batch must cut BCE several-fold — pins that the
    dynamic-conv/DyReLU/CoordAtt chain, the temperature input, and the
    grouped-conv fold all train together, not just run."""
    model = DyMN(DyMNConfig(width_mult=0.2, num_classes=4, t_max=30.0))
    state = tiny_state(model, lr=2e-3)
    train_step = make_train_step(
        model, MEL, LossConfig(kind="bce", mixup_alpha=0.0))
    jt = jax.jit(train_step)

    rng = np.random.default_rng(0)
    t = np.arange(WAVE_LEN) / 32000.0
    waves, targets = [], []
    for i in range(8):
        cls = i % 4
        f0 = [300.0, 800.0, 2000.0, 5000.0][cls]
        waves.append((0.3 * np.sin(2 * np.pi * f0 * t)
                      + 0.01 * rng.normal(size=WAVE_LEN)).astype(np.float32))
        onehot = np.zeros(4, np.float32)
        onehot[cls] = 1.0
        targets.append(onehot)
    batch = {"wave": np.stack(waves), "target": np.stack(targets)}

    losses = []
    temp = jnp.float32(30.0)  # pretraining-start temperature
    for step in range(30):
        state, metrics = jt(state, batch, jax.random.PRNGKey(7), temp)
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] / 3, (losses[0], losses[-1])
