"""Long-form audio tagging via batched sliding windows.

Reference surface: windowed_inference.py:12-124 (``EATagger.tag_audio_window``)
— there, a sequential Python loop runs the model once per window at batch
size 1 (the throughput kill called out in SURVEY.md §3.4). Here all windows
of a clip are stacked into ONE device batch and the whole
mel+model+sigmoid pipeline runs as a single jitted call. Window length is
fixed per (window_size, hop) so repeated calls never recompile.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from efficientat_tpu.infer.tag import Tagger


def window_signal(wave: np.ndarray, window_samples: int, hop_samples: int) -> np.ndarray:
    """Split (T,) into (n_windows, window_samples), zero-padding the tail.

    Mirrors the reference's pad-to-whole-windows behavior
    (windowed_inference.py:89-96).
    """
    n = max(int(np.ceil(max(len(wave) - window_samples, 0) / hop_samples)) + 1, 1)
    padded_len = (n - 1) * hop_samples + window_samples
    wave = np.pad(wave, (0, padded_len - len(wave)))
    idx = np.arange(n)[:, None] * hop_samples + np.arange(window_samples)[None, :]
    return wave[idx]


def tag_audio_window(
    tagger: Tagger,
    audio_path: str,
    window_size: float = 10.0,
    hop_length: float = 2.5,
    top_k: int = 10,
    max_batch: Optional[int] = None,
) -> List[dict]:
    """Tag a long recording in sliding windows.

    Returns [{"start": s, "end": e, "tags": [(label, prob), ...]}, ...].
    ``max_batch`` caps the device batch (longer files are processed in
    equal-shaped chunks to keep one compiled program).
    """
    from efficientat_tpu.data.audio_io import load_waveform

    sr = tagger.mel_cfg.sr
    wave = load_waveform(audio_path, target_sr=sr)
    win = int(window_size * sr)
    hop = int(hop_length * sr)
    windows = window_signal(wave, win, hop)  # (N, win)

    if max_batch is None or windows.shape[0] <= max_batch:
        probs = tagger.predict(windows)
    else:
        # pad N up to a multiple of max_batch so every chunk shares one jit
        n = windows.shape[0]
        n_pad = (-n) % max_batch
        padded = np.concatenate([windows, np.zeros((n_pad, win), windows.dtype)])
        chunks = [tagger.predict(padded[i:i + max_batch])
                  for i in range(0, len(padded), max_batch)]
        probs = np.concatenate(chunks)[:n]

    results = []
    for i, p in enumerate(probs):
        order = np.argsort(p)[::-1][:top_k]
        results.append({
            "start": i * hop_length,
            "end": i * hop_length + window_size,
            "tags": [(tagger.labels[j], float(p[j])) for j in order],
        })
    return results


class EATagger(Tagger):
    """Drop-in analogue of the reference's ``EATagger``
    (windowed_inference.py:12-124): construct by model name, call
    ``tag_audio_window(path, window_size, hop_length)``.

    Unlike the reference, ensembles work here (its ensemble import is dead
    code, windowed_inference.py:8) and windows run as one device batch.
    """

    def tag_audio_window(self, audio_path: str, window_size: float = 20.0,
                         hop_length: float = 10.0, top_k: int = 10,
                         max_batch=None):
        return tag_audio_window(self, audio_path, window_size, hop_length,
                                top_k, max_batch)
