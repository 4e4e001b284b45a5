"""The training engine: one pjit'd train/eval step for every task.

The five reference training scripts (ex_audioset.py, ex_esc50.py, ...)
share one inner loop shape — mel forward, (mixstyle|mixup), model forward,
per-task loss, Adam(W) step, per-epoch LR schedule. Here that is ONE
compiled XLA program: waveform -> log-mel (with augmentation) -> model ->
loss -> grads -> optimizer update, all on device. Batches are sharded over
the mesh's ``data`` axis; gradients are all-reduced by the SPMD partitioner.

Loss kinds (reference loops):
- ``bce``        — multi-label BCE-with-logits (ex_fsd50k.py:103-116),
                   optional KD mixing (ex_audioset.py:149-189)
- ``ce``         — mixup-weighted cross-entropy (ex_esc50.py:103-118)
- ``masked_bce`` — OpenMIC's observed-mask-weighted BCE
                   (ex_openmic.py:102-121)

BatchNorm note: under SPMD jit the batch statistics are computed over the
GLOBAL batch (sync-BN); the reference's DDP uses per-replica stats. Global
stats are statistically stronger and deterministic w.r.t. device count.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from efficientat_tpu.models.dymn import DyMN
from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
from efficientat_tpu.ops.melspec import MelConfig
from efficientat_tpu.train.augment import apply_mixup, mixstyle, mixup_coefficients


class TrainState(train_state.TrainState):
    batch_stats: Any = None


@dataclasses.dataclass(frozen=True)
class LossConfig:
    kind: str = "bce"  # bce | ce | masked_bce
    mixup_alpha: float = 0.3
    mixstyle_p: float = 0.0
    mixstyle_alpha: float = 0.4
    kd_lambda: float = 0.0  # weight on the hard-label loss when distilling


def make_optimizer(max_lr_schedule, weight_decay: float = 0.0, adamw: bool = False):
    """Adam / AdamW with the reference's semantics.

    torch ``Adam(weight_decay=wd)`` adds wd*param to the gradient *before*
    the moment updates (coupled L2) — that is add_decayed_weights THEN adam.
    ``AdamW`` is the decoupled variant (optax.adamw).
    """
    if adamw:
        return optax.adamw(max_lr_schedule, weight_decay=weight_decay)
    if weight_decay > 0:
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.adam(max_lr_schedule))
    return optax.adam(max_lr_schedule)


def create_train_state(model, rng, tx, input_shape=(1, 128, 1000, 1)) -> TrainState:
    from efficientat_tpu.utils.common import host_init

    variables = host_init(model, rng, jnp.zeros(input_shape, jnp.float32))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def _model_forward(model, params, batch_stats, x, train: bool, temperature,
                   dropout_rng=None, time_valid=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if isinstance(model, DyMN):
        args = (x, train, temperature, time_valid)
    else:
        args = (x, train, time_valid)
    if train:
        (logits, emb), mutated = model.apply(
            variables, *args, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
        return logits, emb, mutated["batch_stats"]
    logits, emb = model.apply(variables, *args)
    return logits, emb, batch_stats


def _bce(logits, targets):
    return optax.sigmoid_binary_cross_entropy(logits, targets)


def _task_loss(loss_cfg: LossConfig, logits, batch, perm, lam):
    """Per-task loss. Returns (loss, aux dict)."""
    target = batch["target"]
    if loss_cfg.kind == "ce":
        # integer labels (DCASE20) or one-hot/soft targets (ESC-50, possibly
        # pre-mixed by waveform mixup) — both appear in the reference loops
        if target.ndim == 2:
            ce = optax.softmax_cross_entropy
        else:
            ce = optax.softmax_cross_entropy_with_integer_labels
        if perm is not None:
            samples = ce(logits, target) * lam + ce(logits, target[perm]) * (1.0 - lam)
        else:
            samples = ce(logits, target)
        return samples.mean(), {}

    if loss_cfg.kind == "masked_bce":
        # targets: (B, 2*C) = [instrument probs, observed mask] (ex_openmic.py:102-110)
        c = target.shape[1] // 2
        mask = target[:, c:]
        y = (target[:, :c] > 0.5).astype(logits.dtype)
        if perm is not None:
            y = y * lam[:, None] + y[perm] * (1.0 - lam[:, None])
        samples = _bce(logits, y) * mask
        return samples.mean(), {}

    # bce (+ optional KD)
    y = target
    if perm is not None:
        y = y * lam[:, None] + y[perm] * (1.0 - lam[:, None])
    label_loss = _bce(logits, y).mean()
    if loss_cfg.kd_lambda <= 0:
        return label_loss, {"label_loss": label_loss}

    teacher = batch["teacher"]           # sigmoid probs (B, C)
    valid = batch["teacher_valid"]       # (B,) 0/1 — files with teacher preds
    if perm is not None:
        soft = (_bce(logits, teacher).mean(axis=1) * lam
                + _bce(logits, teacher[perm]).mean(axis=1) * (1.0 - lam))
    else:
        soft = _bce(logits, teacher).mean(axis=1)
    soft = (soft * valid).mean()
    loss = loss_cfg.kd_lambda * label_loss + (1.0 - loss_cfg.kd_lambda) * soft
    return loss, {"label_loss": label_loss, "distillation_loss": soft}


def make_train_step(model, mel_cfg: MelConfig, loss_cfg: LossConfig,
                    mesh=None) -> Callable:
    """Build the jittable train step: (state, batch, rng, temperature) ->
    (state, metrics). ``batch`` holds host arrays: wave (B, T), target, and
    for KD teacher/teacher_valid."""

    from efficientat_tpu.parallel.spmd import data_parallel_lowering

    def step_body(state: TrainState, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array, temperature: jnp.ndarray):
        r_mel, r_mix, r_style, r_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 4)

        # compressed wave transport (data/wavecodec.py): int16 PCM or
        # mu-law uint8 arrive at 1/2 / 1/4 the bytes, decode on device
        from efficientat_tpu.data.wavecodec import decode_on_device

        wave = decode_on_device(batch["wave"])
        mel = log_mel_spectrogram_fused(wave, mel_cfg, training=True,
                                        rng=r_mel, mesh=mesh)
        x = mel[..., None]

        perm = lam = None
        if loss_cfg.mixstyle_p > 0:
            x = mixstyle(x, r_style, loss_cfg.mixstyle_p, loss_cfg.mixstyle_alpha)
        elif loss_cfg.mixup_alpha > 0:
            perm, lam = mixup_coefficients(r_mix, x.shape[0], loss_cfg.mixup_alpha)
            x = apply_mixup(x, perm, lam)

        def loss_fn(params):
            logits, _, new_stats = _model_forward(
                model, params, state.batch_stats, x, True, temperature, r_drop)
            loss, aux = _task_loss(loss_cfg, logits, batch, perm, lam)
            return loss, (aux, new_stats)

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics = {"train_loss": loss, **aux}
        return state, metrics

    def train_step(state, batch, rng, temperature):
        # publish the mesh while tracing so SPMD-hostile lowerings
        # (the dynamic depthwise fold) can localize to their batch shard
        with data_parallel_lowering(mesh):
            return step_body(state, batch, rng, temperature)

    return train_step


def make_eval_step(model, mel_cfg: MelConfig, mesh=None,
                   masked: bool = False) -> Callable:
    """Jittable eval step: (state, wave, temperature[, time_valid]) -> logits.

    With ``masked=True`` the step takes a per-sample valid INPUT-mel-frame
    count; the model re-masks padded frames at every stage, so together with
    ``data.core.exact_eval_pad`` the logits equal the reference's batch-1
    exact-length mode (ex_fsd50k.py:73-77) to fp rounding.
    """

    from efficientat_tpu.parallel.spmd import data_parallel_lowering

    if masked:
        def eval_step(state: TrainState, wave: jnp.ndarray,
                      temperature: jnp.ndarray, time_valid: jnp.ndarray):
            with data_parallel_lowering(mesh):
                mel = log_mel_spectrogram_fused(wave, mel_cfg, training=False,
                                                mesh=mesh)
                logits, _, _ = _model_forward(model, state.params,
                                              state.batch_stats, mel[..., None],
                                              False, temperature,
                                              time_valid=time_valid)
            return logits

        return eval_step

    def eval_step(state: TrainState, wave: jnp.ndarray, temperature: jnp.ndarray):
        with data_parallel_lowering(mesh):
            mel = log_mel_spectrogram_fused(wave, mel_cfg, training=False,
                                            mesh=mesh)
            logits, _, _ = _model_forward(model, state.params, state.batch_stats,
                                          mel[..., None], False, temperature)
        return logits

    return eval_step


def jit_steps(train_step, eval_step, mesh=None, donate_state: bool = True):
    """jit the steps; with a mesh, constrain state replicated / batch data-sharded."""
    if mesh is None:
        return (jax.jit(train_step, donate_argnums=(0,) if donate_state else ()),
                jax.jit(eval_step))
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    jt = jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
    # eval inputs inherit shardings from their placement (state replicated,
    # host arrays committed per call); works for both eval signatures
    je = jax.jit(eval_step)
    return jt, je
