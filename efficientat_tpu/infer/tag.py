"""Single-clip audio tagging (reference surface: inference.py:15-63).

The whole pipeline — log-mel front-end, backbone, sigmoid — runs as ONE
jitted XLA program per (batch, length) shape bucket; nothing eager touches
the device. On TPU the mel GEMMs and convs stay in fp32/bf16 per the model
dtype, with the mel matmul pinned fp32 (models/preprocess.py:56-57).
"""

from __future__ import annotations

import warnings
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from efficientat_tpu.data.wavecodec import decode_on_device
from efficientat_tpu.models.dymn import DyMN
from efficientat_tpu.models.registry import build_model, get_model_config
from efficientat_tpu.ops.mel_pallas import log_mel_spectrogram_fused
from efficientat_tpu.utils.labels import AUDIOSET_LABELS


class Tagger:
    """Audio tagger over one model or an averaged ensemble of models.

    Parameters
    ----------
    names: registry name(s), e.g. "mn10_as" or ["dymn10_as", "mn40_as_ext"].
    pretrained: load + convert the reference checkpoint(s) (requires the .pt
        in ``resources/`` or network access). With ``pretrained=False`` the
        model is randomly initialized — useful for pipeline testing.
    mesh: optional ``jax.sharding.Mesh``. With a ``("data", "model")`` mesh
        (``parallel.make_mesh(n, model_axis=m)``) and an ensemble whose
        members all share one architecture (e.g. the reference's 9x mn40,
        README.md:113-116), members shard over the ``model`` axis and the
        batch over ``data`` — per-chip parameter memory stays flat and the
        only communication is one logit psum (parallel/ensemble.py).
        Heterogeneous ensembles fall back to the replicated path.

    Transport policy
    ----------------
    ``predict`` accepts float32, int16 PCM, or mu-law uint8 waves
    (data/wavecodec.py; decoded in-program on device). REMOTE callers —
    anything where the request crosses a network or narrow PCIe link —
    should encode with ``wavecodec.encode(waves, "mulaw8")``: a B=256
    request drops from 328 MB to 82 MB, and on a bandwidth-bound link the
    served rate scales with it (measured 4.5x at B=256 on a ~100 MB/s
    tunnel, BENCH r4: 89 vs 20 clips/s). Use ``i16`` when the source is
    already int16 PCM (exact, 2x). Local callers with the array in host
    RAM can pass float32 — the transfer is not the bottleneck there.
    """

    def __init__(
        self,
        names: Union[str, Sequence[str]],
        pretrained: bool = True,
        num_classes: Optional[int] = None,
        dtype=jnp.float32,
        labels: Sequence[str] = AUDIOSET_LABELS,
        model_dir: str = "resources",
        mesh=None,
        max_device_batch: Optional[int] = None,
    ):
        if isinstance(names, str):
            names = [names]
        self.labels = list(labels)
        self.members = []
        self.mel_cfg = get_model_config(names[0]).mel_cfg
        for name in names[1:]:
            other = get_model_config(name).mel_cfg
            if other != self.mel_cfg:
                raise ValueError(
                    f"ensemble members disagree on the mel front-end: "
                    f"{names[0]!r} uses {self.mel_cfg}, {name!r} uses {other}. "
                    "All members must share one mel config (reference "
                    "models/ensemble.py:25-33 feeds one spectrogram to all).")
        for i, name in enumerate(names):
            if pretrained:
                from efficientat_tpu.models.convert import load_pretrained

                model, variables, spec = load_pretrained(
                    name, num_classes=num_classes, model_dir=model_dir, dtype=dtype)
            else:
                model, spec = build_model(name, num_classes=num_classes, dtype=dtype)
                from efficientat_tpu.utils.common import host_init

                variables = host_init(
                    model, jax.random.PRNGKey(i),
                    jnp.zeros((1, self.mel_cfg.n_mels, 64, 1), jnp.float32))
                warnings.warn(f"{name}: using random weights (pretrained=False)")
            self.members.append((model, variables))
        self._jitted: Dict[Tuple[int, int], callable] = {}
        # staged transfers: device_put/jnp.asarray from a caller's fresh
        # buffer is up to 80x slower on remote-device runtimes (THP
        # first-touch + fresh-mapping transfer path — see data/staging.py);
        # serving traffic is exactly the repeated-fresh-buffer pattern
        from efficientat_tpu.data.staging import HostStagingPool

        self._staging = HostStagingPool()

        # DyMN serves fastest at a 64-clip micro-batch and tolerates at most
        # two of them per compiled program (infer/microbatch.py); larger
        # request batches are split into async device dispatches here.
        if max_device_batch is None and any(
                isinstance(m, DyMN) for m, _ in self.members):
            from efficientat_tpu.infer.microbatch import DYMN_MAX_DEVICE_BATCH

            max_device_batch = DYMN_MAX_DEVICE_BATCH
        self.max_device_batch = max_device_batch

        self.mesh = mesh
        self._stacked = None
        if mesh is not None and "model" in mesh.axis_names and len(self.members) > 1:
            m0 = self.members[0][0]
            same_arch = all(
                type(m) is type(m0) and m.cfg == m0.cfg and m.dtype == m0.dtype
                for m, _ in self.members)
            if same_arch and len(self.members) % mesh.shape["model"] == 0:
                from efficientat_tpu.parallel.ensemble import (
                    shard_member_params, stack_member_params)

                self._stacked = shard_member_params(
                    stack_member_params([v for _, v in self.members]), mesh)

    def _member_apply(self, model):
        if isinstance(model, DyMN):
            # DyMN serves fastest at a fixed micro-batch; larger batches
            # lax.map over chunks of it (see infer/microbatch.py)
            from efficientat_tpu.infer.microbatch import (
                DYMN_MICRO_BATCH, microbatched)

            def apply(v, x):
                fn = lambda xx: model.apply(v, xx, False, model.cfg.t_max)[0]
                return microbatched(fn, DYMN_MICRO_BATCH)(x)

            return apply
        return lambda v, x: model.apply(v, x)[0]

    def _make_fn(self):
        mel_cfg = self.mel_cfg
        members = self.members

        if self._stacked is not None:
            from efficientat_tpu.parallel.ensemble import (
                make_member_parallel_ensemble)

            ens = make_member_parallel_ensemble(
                self._member_apply(members[0][0]), self.mesh, len(members))

            def fn(stacked, waves):
                waves = decode_on_device(waves)
                mel = log_mel_spectrogram_fused(waves, mel_cfg, mesh=self.mesh)
                return jax.nn.sigmoid(ens(stacked, mel[..., None]))

            return fn

        def fn(variables_list, waves):
            # coded waves (int16 PCM / mu-law uint8, data/wavecodec.py)
            # decode in-program: remote callers can ship 2-4x fewer bytes
            waves = decode_on_device(waves)
            mel = log_mel_spectrogram_fused(waves, mel_cfg)  # (B, n_mels, frames)
            x = mel[..., None]  # NHWC: (B, F, T, 1)
            logits_sum = None
            for (model, _), variables in zip(members, variables_list):
                out = self._member_apply(model)(variables, x)
                logits_sum = out if logits_sum is None else logits_sum + out
            logits = logits_sum / len(members)
            return jax.nn.sigmoid(logits)

        return fn

    def predict(self, waves: np.ndarray) -> np.ndarray:
        """waves: (B, num_samples) at mel_cfg.sr -> probs (B, classes).

        Accepts float32, int16 PCM, or mu-law uint8 waves (the coded
        transports of data/wavecodec.py — decoded on device); callers on
        the far side of a narrow link can ship 2-4x fewer bytes."""
        waves = np.atleast_2d(np.asarray(waves))
        if waves.dtype not in (np.int16, np.uint8):
            waves = waves.astype(np.float32)
        # mu-law code 128 IS silence (wavecodec mid-tread mapping)
        pad_value = 128 if waves.dtype == np.uint8 else 0
        key = (waves.shape, waves.dtype)
        mdb = self.max_device_batch
        split = (self._stacked is None and mdb and waves.shape[0] > mdb)
        if not split and key not in self._jitted:
            self._jitted[key] = jax.jit(self._make_fn())
        if self._stacked is not None:
            # pad the batch to a multiple of the data axis (sharding
            # requires even splits), run, slice the padding back off
            n = waves.shape[0]
            ddim = self.mesh.shape["data"]
            n_pad = (-n) % ddim
            if n_pad:
                waves = np.concatenate(
                    [waves, np.full((n_pad,) + waves.shape[1:], pad_value,
                                    waves.dtype)])
                key = (waves.shape, waves.dtype)
                if key not in self._jitted:
                    self._jitted[key] = jax.jit(self._make_fn())
            from efficientat_tpu.parallel.mesh import data_sharding

            waves = self._staging.put(waves, data_sharding(self.mesh))
            return np.asarray(self._jitted[key](self._stacked, waves))[:n]
        variables_list = [v for _, v in self.members]
        if split:
            # host-side split into equal dispatches: pad to a multiple of
            # mdb so one compiled program serves every chunk; dispatches
            # queue asynchronously and pipeline on device
            n = waves.shape[0]
            n_pad = (-n) % mdb
            if n_pad:
                waves = np.concatenate(
                    [waves, np.full((n_pad,) + waves.shape[1:], pad_value,
                                    waves.dtype)])
            ckey = ((mdb,) + waves.shape[1:], waves.dtype)
            if ckey not in self._jitted:
                self._jitted[ckey] = jax.jit(self._make_fn())
            fn = self._jitted[ckey]
            outs = [fn(variables_list, self._staging.put(waves[i:i + mdb]))
                    for i in range(0, waves.shape[0], mdb)]
            return np.concatenate([np.asarray(o) for o in outs])[:n]
        return np.asarray(self._jitted[key](variables_list,
                                            self._staging.put(waves)))

    def tag(self, path: str, top_k: int = 10) -> List[Tuple[str, float]]:
        """Decode an audio file and return the top-k (label, prob) pairs."""
        from efficientat_tpu.data.audio_io import load_waveform

        wave = load_waveform(path, target_sr=self.mel_cfg.sr)
        probs = self.predict(wave[None, :])[0]
        order = np.argsort(probs)[::-1][:top_k]
        return [(self.labels[i], float(probs[i])) for i in order]
