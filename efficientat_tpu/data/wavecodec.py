"""Wave transport codecs: encode on host, decode on device.

Host->device bandwidth is a first-class budget for audio training (on
remote runtimes it is often the binding constraint — see
docs/DESIGN.md "Host->device feed path"). Waves can transport as:

- ``f32``    — float32, no encoding (4 bytes/sample).
- ``i16``    — int16 PCM (2 bytes/sample). EXACT for int16 PCM sources
  (the storage format of converted HDF5 datasets); for decoded-mp3
  sources the requantization error (<=3e-5) is far below the codec
  noise floor.
- ``mulaw8`` — ITU G.711-style mu-law companding, mu=255 (1 byte/sample,
  4x less than float32). Lossy: ~38 dB SNR on full-scale audio, the
  same transform telephony uses; well below the distortion of the
  64 kbps mp3s the AudioSet corpus itself is stored in. Opt-in for
  transfer-bound pipelines.

The decode runs INSIDE the jitted train step (``decode_on_device``),
dispatching on dtype — int16 means i16 PCM, uint8 means mu-law — so the
transport choice never recompiles anything else and costs one fused
elementwise op on device.
"""

from __future__ import annotations

import numpy as np

CODECS = ("f32", "i16", "mulaw8")
_MU = 255.0

# int16 -> mu-law uint8 lookup (the common storage format), built lazily:
# 64K table, exact vs the float formula by construction
_I16_TO_MULAW = None


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> uint8 mu-law code.

    Mid-tread mapping centered at code 128 so SILENCE IS EXACT: encoded
    zeros decode to exactly 0.0 (zero-padded clip tails and masked eval
    regions must stay zero through the transport). Costs one code level
    at positive full scale (+1.0 clips to 0.9961 pre-compander)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.clip(np.round(y * 127.5) + 128.0, 0.0, 255.0).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law code -> float32 (host-side oracle for the device op)."""
    y = (u.astype(np.float32) - 128.0) / 127.5
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU)) / _MU)


def _i16_mulaw_table() -> np.ndarray:
    # indexed by the int16 value REINTERPRETED as uint16 (a free .view),
    # so the hot path is one fancy-index with no cast or offset add
    global _I16_TO_MULAW
    if _I16_TO_MULAW is None:
        pcm = np.arange(65536, dtype=np.uint16).view(np.int16).astype(np.float32)
        _I16_TO_MULAW = mulaw_encode(pcm / 32768.0)
    return _I16_TO_MULAW


def encode(wave: np.ndarray, codec: str) -> np.ndarray:
    """Encode a float32 or int16 wave for transport."""
    if codec == "f32":
        return wave.astype(np.float32) if wave.dtype != np.float32 else wave
    if codec == "i16":
        if wave.dtype == np.int16:
            return wave
        return np.clip(wave * 32768.0, -32768, 32767).astype(np.int16)
    if codec == "mulaw8":
        if wave.dtype == np.int16:  # table path: no float conversion
            return _i16_mulaw_table()[wave.view(np.uint16)]
        return mulaw_encode(wave)
    raise ValueError(f"unknown wave codec {codec!r}; pick one of {CODECS}")


def decode_on_device(wave):
    """Traced decode to float32 inside a jitted step (dtype-dispatched)."""
    import jax.numpy as jnp

    if wave.dtype == jnp.int16:
        return wave.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    if wave.dtype == jnp.uint8:
        y = (wave.astype(jnp.float32) - 128.0) * jnp.float32(1.0 / 127.5)
        scale = jnp.float32(np.log1p(_MU))
        return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * scale)
                              * jnp.float32(1.0 / _MU))
    return wave
