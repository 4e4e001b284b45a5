"""Train / evaluate drivers behind ``python -m efficientat_tpu.cli train <task>``.

One engine for all five reference scripts. Flags mirror the reference
surfaces (same names/defaults per task, see train/tasks.py) plus:
--dataset_dir (no edit-the-source constants), --synthetic N (structural
smoke data), --resume (true resume — absent upstream), --ckpt_dir,
--export (msgpack weights for the Tagger), --bf16 (compute dtype).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import warnings
import numpy as np


def _build_parser(spec):
    p = argparse.ArgumentParser(prog=f"train {spec.name}")
    for key, val in spec.defaults.items():
        if key == "num_devices":  # preset-overridable global flag (below)
            continue
        if isinstance(val, bool):
            p.add_argument(f"--{key}", action="store_true", default=val)
        elif val is None:
            p.add_argument(f"--{key}", default=None)
        else:
            p.add_argument(f"--{key}", type=type(val), default=val)
    # model-architecture flags shared by every task (the reference exposes
    # them on each training script: ex_audioset.py:343 strides, and
    # get_model's se_agg, models/mn/model.py:329 — the fc_s2221/s2211
    # training recipes need both). Default None = keep the model config's
    # own value, so loading e.g. mn10_as_fc_s2221 pretrained without the
    # flag keeps its registry strides (2,2,2,1); strides never change
    # param shapes, so overriding them on pretrained weights is legal
    # (that IS the fc_s2221 recipe: ImageNet weights, re-strided).
    p.add_argument("--strides", nargs=4, type=int, default=None)
    p.add_argument("--se_agg", choices=["max", "avg", "add", "min"],
                   default=None)
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic clips instead of the real dataset")
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--export", type=str, default=None,
                   help="write final weights (msgpack) to this path")
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize block activations in backward "
                        "(jax.checkpoint): big widths / batches on one chip")
    p.add_argument("--int16_waves", action="store_true", default=False,
                   help="alias for --wave_codec i16")
    p.add_argument("--wave_codec", choices=["f32", "i16", "mulaw8"],
                   default=None,
                   help="wave transport host->device (data/wavecodec.py): "
                        "i16 = half the bytes (exact for PCM sources), "
                        "mulaw8 = quarter (lossy ~38 dB SNR). Decoded on "
                        "device. Incompatible with wavmix/gain_augment")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--keep_checkpoints", type=int, default=1)
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--num_devices", type=int,
                   default=spec.defaults.get("num_devices"),
                   help="devices in the data-parallel mesh (default: all; "
                        "the Lightning variant's flag, ex_pl_audioset.py:306)")
    p.add_argument("--eval_only", action="store_true", default=False)
    p.add_argument("--split", choices=["val", "eval"], default=None,
                   help="which held-out split to evaluate (fsd50k: val during "
                        "training, eval for `evaluate`, ex_fsd50k.py:216-219)")
    p.add_argument("--weights", type=str, default=None,
                   help="msgpack weights to load (from --export)")
    return p


def _mel_config(args):
    from efficientat_tpu.ops.melspec import MelConfig

    return MelConfig(
        n_mels=args.n_mels, sr=args.resample_rate, win_length=args.window_size,
        hopsize=args.hop_size, n_fft=args.n_fft, freqm=args.freqm,
        timem=args.timem, fmin=float(args.fmin),
        fmax=None if args.fmax in (None, "None") else float(args.fmax),
        fmin_aug_range=args.fmin_aug_range, fmax_aug_range=args.fmax_aug_range)


def _build_model(spec, args, dtype):
    """Reference model-selection logic (ex_audioset.py:61-70)."""
    import jax.numpy as jnp

    from efficientat_tpu.models.dymn import DyMN, DyMNConfig
    from efficientat_tpu.models.mn import MN, MNConfig
    from efficientat_tpu.utils.common import NAME_TO_WIDTH

    name = args.model_name
    width = NAME_TO_WIDTH(name) if args.pretrained else args.model_width
    remat = bool(getattr(args, "remat", False))
    strides = getattr(args, "strides", None)  # None = keep config default
    se_agg = getattr(args, "se_agg", None)
    if args.pretrained:
        from efficientat_tpu.models.convert import load_pretrained

        model, variables, _ = load_pretrained(name, num_classes=spec.num_classes,
                                              dtype=dtype)
        cfg = dataclasses.replace(model.cfg, remat=remat)
        if strides is not None:  # legal on loaded weights: stride changes
            cfg = dataclasses.replace(cfg, strides=tuple(strides))  # no shapes
        if se_agg is not None and hasattr(cfg, "se_agg"):
            cfg = dataclasses.replace(cfg, se_agg=se_agg)
        if isinstance(cfg, DyMNConfig):
            cfg = dataclasses.replace(cfg, t_max=args.pretrain_final_temp)
            model = DyMN(cfg, dtype=dtype)
        else:
            model = MN(cfg, dtype=dtype)
        return model, variables
    if name.startswith("dymn"):
        cfg = DyMNConfig(num_classes=spec.num_classes, width_mult=width,
                         strides=tuple(strides or (2, 2, 2, 2)), remat=remat)
        return DyMN(cfg, dtype=dtype), None
    cfg = MNConfig(num_classes=spec.num_classes, width_mult=width,
                   head_type=args.head_type, se_dims=args.se_dims,
                   se_agg=se_agg or "max",
                   strides=tuple(strides or (2, 2, 2, 2)), remat=remat)
    return MN(cfg, dtype=dtype), None


def _prepare_batch(batch, spec, teacher):
    wave = batch["wave"]
    # coded waves (int16 PCM / mu-law uint8, data/wavecodec.py) transfer
    # as-is at 1/2 / 1/4 the bytes and decode on device
    out = {"wave": wave if wave.dtype in (np.int16, np.uint8)
           else wave.astype(np.float32)}
    target = batch["target"]
    if spec.loss_kind == "ce" and np.asarray(target).ndim == 1:
        out["target"] = np.asarray(target, np.int32)
    else:
        out["target"] = np.asarray(target, np.float32)
    if teacher is not None:
        rows, valid = teacher.lookup(batch["fname"])
        out["teacher"] = rows
        out["teacher_valid"] = valid
    return out


def _eval_metrics(spec, logits, targets):
    """Per-task eval metrics from collected logits/targets (numpy)."""
    from efficientat_tpu.train.metrics import accuracy, macro_metrics

    probs = 1.0 / (1.0 + np.exp(-logits))
    if spec.metric == "accuracy":
        tgt = targets if targets.ndim == 1 else targets.argmax(1)
        logp = logits - logits.max(1, keepdims=True)
        logz = np.log(np.exp(logp).sum(1))
        val_loss = float(np.mean(logz - logp[np.arange(len(tgt)), tgt.astype(int)]))
        return {"accuracy": accuracy(tgt, logits), "val_loss": val_loss}
    if spec.metric == "masked_map":
        c = spec.num_classes
        y = (targets[:, :c] > 0.5).astype(np.float64)
        mask = targets[:, c:]
        m_ap, m_roc = macro_metrics(y, probs, sample_weight=mask)
        bce = -(y * np.log(probs + 1e-12) + (1 - y) * np.log(1 - probs + 1e-12))
        return {"mAP": m_ap, "ROC": m_roc, "val_loss": float((bce * mask).mean())}
    y = (targets > 0.5).astype(np.float64)
    m_ap, m_roc = macro_metrics(y, probs)
    bce = -(y * np.log(probs + 1e-12) + (1 - y) * np.log(1 - probs + 1e-12))
    return {"mAP": m_ap, "ROC": m_roc, "val_loss": float(bce.mean())}


def _run_eval(spec, je, state, eval_loader, temperature, batch_size,
              variable_cfg=None):
    """variable_cfg: (model_cfg, mel_cfg) enables masked variable-length eval."""
    import jax.numpy as jnp

    from efficientat_tpu.data.staging import HostStagingPool

    staging = HostStagingPool()
    all_logits, all_targets = [], []
    for batch in eval_loader.epoch(0):
        wave = batch["wave"].astype(np.float32)
        n = wave.shape[0]
        if n < batch_size:  # pad to the compiled shape
            wave = np.concatenate(
                [wave, np.zeros((batch_size - n,) + wave.shape[1:], np.float32)])
        if variable_cfg is not None:
            _, mel_cfg = variable_cfg
            samples = np.asarray(batch["wave_samples"], np.int64)
            # valid INPUT mel frames; the model derives per-stage counts
            tv = ((samples - 1) // mel_cfg.hopsize + 1).astype(np.int32)
            tv = np.concatenate([tv, np.ones(wave.shape[0] - n, np.int32)])
            logits = np.asarray(je(state, staging.put(wave), temperature,
                                   jnp.asarray(tv)))[:n]
        else:
            logits = np.asarray(je(state, staging.put(wave), temperature))[:n]
        all_logits.append(logits)
        t = np.asarray(batch["target"])
        all_targets.append(t if t.ndim > 0 else t[None])
    return _eval_metrics(spec, np.concatenate(all_logits),
                         np.concatenate(all_targets))


def run_train(task_name: str, argv):
    import jax
    import jax.numpy as jnp

    from efficientat_tpu.utils.host import disable_thp_first_touch

    disable_thp_first_touch()  # see utils/host.py: ~90x on lazy VM RAM

    from efficientat_tpu.data.core import Loader
    from efficientat_tpu.models.dymn import DyMN
    from efficientat_tpu.parallel import make_mesh
    from efficientat_tpu.parallel.mesh import replicate
    from efficientat_tpu.train.loop import (
        LossConfig, create_train_state, jit_steps, make_eval_step,
        make_optimizer, make_train_step,
    )
    from efficientat_tpu.train.schedules import exp_warmup_linear_down, per_epoch_schedule
    from efficientat_tpu.train.tasks import TASKS, build_datasets
    from efficientat_tpu.utils.checkpointing import (
        export_weights, restore_checkpoint, save_checkpoint,
    )
    from efficientat_tpu.utils.logging import MetricsLogger

    spec = TASKS[task_name]
    args = _build_parser(spec).parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mel_cfg = _mel_config(args)

    train_ds, sampler, eval_ds = build_datasets(spec, args,
                                                eval_only=args.eval_only)
    train_loader = None if train_ds is None else Loader(
        train_ds, args.batch_size, sampler=sampler,
        num_threads=args.num_workers, drop_last=True, seed=args.seed)
    variable_eval = bool(getattr(args, "variable_eval_length", False))
    eval_bs = min(args.batch_size, len(eval_ds))
    if variable_eval:
        from efficientat_tpu.data.core import bucket_pad_collate

        eval_loader = Loader(eval_ds, eval_bs, num_threads=args.num_workers,
                             seed=args.seed,
                             collate_fn=bucket_pad_collate(args.resample_rate))
    else:
        eval_loader = Loader(eval_ds, eval_bs, num_threads=args.num_workers,
                             seed=args.seed)

    model, pretrained_variables = _build_model(spec, args, dtype)
    steps_per_epoch = max(len(train_loader), 1) if train_loader else 1
    lr = args.max_lr if hasattr(args, "max_lr") else args.lr
    sched = per_epoch_schedule(
        exp_warmup_linear_down(args.warm_up_len, args.ramp_down_len,
                               args.ramp_down_start, args.last_lr_value),
        lr, steps_per_epoch)
    tx = make_optimizer(sched, args.weight_decay, args.adamw)

    n_frames = mel_cfg.num_frames(int(spec.clip_seconds * mel_cfg.sr))
    state = create_train_state(model, jax.random.PRNGKey(args.seed), tx,
                               input_shape=(1, mel_cfg.n_mels, n_frames, 1))
    if pretrained_variables is not None:
        state = state.replace(params=pretrained_variables["params"],
                              batch_stats=pretrained_variables["batch_stats"])
    if args.weights:
        from efficientat_tpu.utils.checkpointing import load_weights

        w = load_weights(args.weights)
        state = state.replace(params=w["params"], batch_stats=w["batch_stats"])

    ckpt_dir = args.ckpt_dir or os.path.join("runs", f"{task_name}-ckpt")
    start_epoch = 0
    if args.resume:
        state, start_epoch = restore_checkpoint(ckpt_dir, state)

    # KD teacher (AudioSet only)
    teacher = None
    kd_lambda = getattr(args, "kd_lambda", 0.0)
    if kd_lambda and kd_lambda > 0 and spec.name == "audioset":
        if args.synthetic:
            from efficientat_tpu.train.kd import SyntheticTeacherStore

            teacher = SyntheticTeacherStore(spec.num_classes)
        else:
            try:
                from efficientat_tpu.train.kd import TeacherStore

                teacher = TeacherStore(args.teacher_preds, args.fname_to_index,
                                       args.temperature)
            except FileNotFoundError as e:
                warnings.warn(f"KD disabled: {e}")
                kd_lambda = 0.0

    loss_cfg = LossConfig(
        kind=spec.loss_kind,
        mixup_alpha=args.mixup_alpha,
        mixstyle_p=getattr(args, "mixstyle_p", 0.0),
        mixstyle_alpha=getattr(args, "mixstyle_alpha", 0.4),
        kd_lambda=kd_lambda if teacher is not None else 0.0)

    # the data axis must divide both batch sizes; shrink the mesh if needed
    import math

    n_dev = args.num_devices or len(jax.devices())
    mesh_size = math.gcd(math.gcd(args.batch_size, eval_bs), n_dev)
    if mesh_size < n_dev:
        # loud, not silent: the reference's DDP would crash on an uneven
        # split; quietly training on fewer chips is a perf trap
        warnings.warn(
            f"data-parallel mesh shrunk to {mesh_size} of {n_dev} devices: "
            f"batch_size={args.batch_size} and eval batch {eval_bs} must be "
            f"divisible by the device count to use every device — pick a "
            f"batch size divisible by {n_dev}")
    mesh = make_mesh(mesh_size)
    jt, je = jit_steps(make_train_step(model, mel_cfg, loss_cfg, mesh),
                       make_eval_step(model, mel_cfg, mesh,
                                      masked=variable_eval), mesh)
    state = replicate(state, mesh)

    logger = MetricsLogger(args.experiment_name or f"efficientat-{task_name}",
                           config=vars(args))
    rng = jax.random.PRNGKey(args.seed + 1)
    # staged transfers: device_put from fresh collate buffers is up to 80x
    # slower on remote-device runtimes (see data/staging.py)
    from efficientat_tpu.data.staging import HostStagingPool, sync_transfer_mode
    from efficientat_tpu.parallel.mesh import data_sharding

    staging = HostStagingPool()
    sync_transfers = sync_transfer_mode()

    var_cfg = (model.cfg, mel_cfg) if variable_eval else None
    if args.eval_only:
        temp = jnp.float32(model.cfg.t_max if isinstance(model, DyMN) else 1.0)
        metrics = _run_eval(spec, je, state, eval_loader, temp, eval_bs, var_cfg)
        logger.log(metrics)
        logger.close()
        return metrics

    for epoch in range(start_epoch, args.n_epochs):
        if isinstance(model, DyMN):
            temp = jnp.float32(model.cfg.temperature(epoch))
        else:
            temp = jnp.float32(1.0)
        epoch_metrics = []
        for batch in train_loader.epoch(epoch):
            prepared = staging.put(_prepare_batch(batch, spec, teacher),
                                   data_sharding(mesh))
            state, metrics = jt(state, prepared, rng, temp)
            if sync_transfers:
                # on this runtime a put overlapping an execution stalls
                # 4-6 s (see data/staging.py::sync_transfer_mode)
                jax.block_until_ready(metrics["train_loss"])
            epoch_metrics.append(metrics)
        train_log = {k: float(np.mean([float(m[k]) for m in epoch_metrics]))
                     for k in epoch_metrics[0]} if epoch_metrics else {}
        eval_log = _run_eval(spec, je, state, eval_loader, temp, eval_bs, var_cfg)
        lr_now = float(sched(int(state.step)))
        logger.log({**train_log, **eval_log, "learning_rate": lr_now,
                    "epoch": epoch}, step=epoch)
        save_checkpoint(ckpt_dir, state, epoch, keep=args.keep_checkpoints)

    if args.export:
        export_weights(args.export, state.params, state.batch_stats)
    logger.close()
    return state


def run_evaluate(task_name: str, argv):
    argv = list(argv) + ["--eval_only"]
    # the reference's evaluate() runs the true eval split (ex_fsd50k.py:216-219)
    if not any(a == "--split" or a.startswith("--split=") for a in argv):
        argv += ["--split", "eval"]
    metrics = run_train(task_name, argv)
    if "mAP" in metrics:
        print("Results on evaluation split:")
        print("  mAP: {:.3f}".format(metrics["mAP"]))
        print("  ROC: {:.3f}".format(metrics["ROC"]))
    elif "accuracy" in metrics:
        print("Results on evaluation split:")
        print("  accuracy: {:.3f}".format(metrics["accuracy"]))
    return metrics
