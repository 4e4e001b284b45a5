"""Test-only ctypes bindings to the system codecs.

- ``encode_mp3_lame``: synthesize real mp3 streams (fixtures) from PCM.
- ``decode_mp3_mpg123``: independent third-party decode used as the oracle
  the first-party decoder (native/eat_mp3.cpp) is verified against.

Both are optional: tests that need them skip when the libraries are absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LAME = "libmp3lame.so.0"
_MPG = "libmpg123.so.0"


def have_lame() -> bool:
    try:
        ctypes.CDLL(_LAME)
        return True
    except OSError:
        return False


def have_mpg123() -> bool:
    try:
        ctypes.CDLL(_MPG)
        return True
    except OSError:
        return False


def encode_mp3_lame(pcm: np.ndarray, sr: int, bitrate: int = 128,
                    mode: str = "mono", vbr: bool = False,
                    quality: int = 5, crc: bool = False,
                    free_format: bool = False) -> bytes:
    """pcm: float32 (n,) mono or (2, n) stereo in [-1, 1] -> mp3 bytes.

    The Xing/LAME info tag is disabled so the stream is plain CBR/VBR frames
    (keeps decoder comparisons free of gapless trimming).
    """
    lib = ctypes.CDLL(_LAME)
    lib.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lib.lame_init())
    ch = 1 if pcm.ndim == 1 else pcm.shape[0]
    lib.lame_set_in_samplerate(gf, sr)
    lib.lame_set_out_samplerate(gf, sr)
    lib.lame_set_num_channels(gf, ch)
    modes = {"stereo": 0, "joint": 1, "mono": 3}
    lib.lame_set_mode(gf, modes[mode if ch == 2 else "mono"])
    lib.lame_set_quality(gf, quality)
    lib.lame_set_bWriteVbrTag(gf, 0)
    if crc:
        lib.lame_set_error_protection(gf, 1)
    if free_format:
        lib.lame_set_free_format(gf, 1)
    if vbr:
        lib.lame_set_VBR(gf, 4)  # vbr_default
        lib.lame_set_VBR_q(gf, 4)
    else:
        lib.lame_set_brate(gf, bitrate)
    rc = lib.lame_init_params(gf)
    assert rc >= 0, f"lame_init_params failed ({rc})"

    if pcm.ndim == 1:
        left = np.ascontiguousarray(pcm, np.float32)
        right = left
        n = len(left)
    else:
        left = np.ascontiguousarray(pcm[0], np.float32)
        right = np.ascontiguousarray(pcm[1], np.float32)
        n = pcm.shape[1]
    bufsize = int(1.25 * n + 7200) + 7200
    buf = (ctypes.c_ubyte * bufsize)()
    fptr = ctypes.POINTER(ctypes.c_float)
    lib.lame_encode_buffer_ieee_float.restype = ctypes.c_int
    m = lib.lame_encode_buffer_ieee_float(
        gf, left.ctypes.data_as(fptr), right.ctypes.data_as(fptr), n,
        buf, bufsize)
    assert m >= 0, f"lame encode failed ({m})"
    m2 = lib.lame_encode_flush(gf, ctypes.byref(buf, m), bufsize - m)
    assert m2 >= 0
    lib.lame_close(gf)
    return bytes(buf[: m + m2])


# mpg123 constants (mpg123.h)
_MPG123_REMOVE_FLAGS = 13
_MPG123_GAPLESS = 0x100
_MPG123_ENC_FLOAT_32 = 0x200
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10


def decode_mp3_mpg123(blob: bytes):
    """mp3 bytes -> (float32 (channels, samples), sr) via libmpg123 (float)."""
    lib = ctypes.CDLL(_MPG)
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    err = ctypes.c_int()
    mh = ctypes.c_void_p(lib.mpg123_new(None, ctypes.byref(err)))
    assert mh, "mpg123_new failed"
    lib.mpg123_param(mh, _MPG123_REMOVE_FLAGS, _MPG123_GAPLESS,
                     ctypes.c_double(0.0))
    # force float32 output at any rate/channels
    lib.mpg123_format_none(mh)
    for rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000):
        lib.mpg123_format(mh, ctypes.c_long(rate), 3, _MPG123_ENC_FLOAT_32)
    rc = lib.mpg123_open_feed(mh)
    assert rc == _MPG123_OK
    rc = lib.mpg123_feed(mh, blob, len(blob))
    assert rc == _MPG123_OK

    out = []
    rate = ctypes.c_long()
    ch = ctypes.c_int()
    enc = ctypes.c_int()
    buf = (ctypes.c_ubyte * 65536)()
    done = ctypes.c_size_t()
    while True:
        rc = lib.mpg123_read(mh, buf, len(buf), ctypes.byref(done))
        if done.value:
            out.append(bytes(buf[: done.value]))
        if rc == _MPG123_NEW_FORMAT:
            lib.mpg123_getformat(mh, ctypes.byref(rate), ctypes.byref(ch),
                                 ctypes.byref(enc))
            assert enc.value == _MPG123_ENC_FLOAT_32, enc.value
        elif rc in (_MPG123_DONE, _MPG123_NEED_MORE):
            break
        elif rc != _MPG123_OK:
            raise RuntimeError(f"mpg123_read rc={rc}")
    lib.mpg123_delete(mh)
    pcm = np.frombuffer(b"".join(out), np.float32)
    c = max(ch.value, 1)
    return pcm.reshape(-1, c).T.copy(), rate.value


def set_mode_ext(blob: bytes, mode_ext: int) -> bytes:
    """Rewrite every joint-stereo frame header's mode_ext bits.

    Lets tests exercise intensity-stereo decode paths with a real oracle:
    LAME never encodes intensity, but both decoders see identical bits, so
    flipping mode_ext on an MS stream must yield identical (re)constructions.
    """
    data = bytearray(blob)
    pos, n = 0, len(blob)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            h1, h2 = data[pos + 1], data[pos + 2]
            version = (h1 >> 3) & 3
            layer = (h1 >> 1) & 3
            br = (h2 >> 4) & 15
            sri = (h2 >> 2) & 3
            if version != 1 and layer == 1 and 0 < br < 15 and sri < 3:
                lsf = version != 3
                sr = [44100, 48000, 32000][sri]
                sr >>= 1 if version == 2 else (2 if version == 0 else 0)
                bitrate = ([0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                            128, 144, 160] if lsf else
                           [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                            192, 224, 256, 320])[br] * 1000
                flen = (72 if lsf else 144) * bitrate // sr + ((h2 >> 1) & 1)
                if ((data[pos + 3] >> 6) & 3) == 1:  # joint stereo
                    data[pos + 3] = (data[pos + 3] & 0b11001111) | (mode_ext << 4)
                pos += flen
                continue
        pos += 1
    return bytes(data)
