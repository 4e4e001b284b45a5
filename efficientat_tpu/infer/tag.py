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
    """

    def __init__(
        self,
        names: Union[str, Sequence[str]],
        pretrained: bool = True,
        num_classes: Optional[int] = None,
        dtype=jnp.float32,
        labels: Sequence[str] = AUDIOSET_LABELS,
        model_dir: str = "resources",
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
        for name in names:
            if pretrained:
                from efficientat_tpu.models.convert import load_pretrained

                model, variables, spec = load_pretrained(
                    name, num_classes=num_classes, model_dir=model_dir, dtype=dtype)
            else:
                model, spec = build_model(name, num_classes=num_classes, dtype=dtype)
                variables = model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, self.mel_cfg.n_mels, 64, 1), jnp.float32))
                warnings.warn(f"{name}: using random weights (pretrained=False)")
            self.members.append((model, variables))
        self._jitted: Dict[Tuple[int, int], callable] = {}

    def _make_fn(self):
        mel_cfg = self.mel_cfg
        members = self.members

        def fn(variables_list, waves):
            mel = log_mel_spectrogram_fused(waves, mel_cfg)  # (B, n_mels, frames)
            x = mel[..., None]  # NHWC: (B, F, T, 1)
            logits_sum = None
            for (model, _), variables in zip(members, variables_list):
                if isinstance(model, DyMN):
                    out, _ = model.apply(variables, x, False, model.cfg.t_max)
                else:
                    out, _ = model.apply(variables, x)
                logits_sum = out if logits_sum is None else logits_sum + out
            logits = logits_sum / len(members)
            return jax.nn.sigmoid(logits)

        return fn

    def predict(self, waves: np.ndarray) -> np.ndarray:
        """waves: (B, num_samples) float32 at mel_cfg.sr -> probs (B, classes)."""
        waves = np.atleast_2d(np.asarray(waves, dtype=np.float32))
        key = waves.shape
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._make_fn())
        variables_list = [v for _, v in self.members]
        return np.asarray(self._jitted[key](variables_list, waves))

    def tag(self, path: str, top_k: int = 10) -> List[Tuple[str, float]]:
        """Decode an audio file and return the top-k (label, prob) pairs."""
        from efficientat_tpu.data.audio_io import load_waveform

        wave = load_waveform(path, target_sr=self.mel_cfg.sr)
        probs = self.predict(wave[None, :])[0]
        order = np.argsort(probs)[::-1][:top_k]
        return [(self.labels[i], float(probs[i])) for i in order]
