"""Pure-numpy MPEG-1/2 Layer III reference decoder (test scaffolding).

Written from the ISO/IEC 11172-3 / 13818-3 decode algorithm; normative
constants come from tests/data/mp3_tables.json (see
scripts/gen_mp3_tables.py). Serves two purposes:

1. an executable specification the C++ decoder (native/eat_mp3.cpp) is
   developed against, and
2. an independent-in-implementation cross-check in tests (the third-party
   oracle is libmpg123 via tests/codec_oracles.py).

Supports: MPEG-1 and MPEG-2/2.5 (LSF) Layer III, mono/stereo/joint stereo
(MS + both intensity variants), long/short/mixed blocks, bit reservoir.
"""

from __future__ import annotations

import json
import os

import numpy as np

_TABLES = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "data", "mp3_tables.json")))

BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
SR_V1 = [44100, 48000, 32000]

SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]

PRETAB = np.asarray(_TABLES["pretab"], np.int32)

# alias-reduction butterflies
_CI = np.asarray([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI ** 2)
_CA = _CI / np.sqrt(1.0 + _CI ** 2)

# big-values table metadata: name -> (xlen, linbits)
BV_TABLES = {
    0: None, 1: ("t1", 2, 0), 2: ("t2", 3, 0), 3: ("t3", 3, 0),
    5: ("t5", 4, 0), 6: ("t6", 4, 0), 7: ("t7", 6, 0), 8: ("t8", 6, 0),
    9: ("t9", 6, 0), 10: ("t10", 8, 0), 11: ("t11", 8, 0), 12: ("t12", 8, 0),
    13: ("t13", 16, 0), 15: ("t15", 16, 0),
    16: ("t16", 16, 1), 17: ("t16", 16, 2), 18: ("t16", 16, 3),
    19: ("t16", 16, 4), 20: ("t16", 16, 6), 21: ("t16", 16, 8),
    22: ("t16", 16, 10), 23: ("t16", 16, 13),
    24: ("t24", 16, 4), 25: ("t24", 16, 5), 26: ("t24", 16, 6),
    27: ("t24", 16, 7), 28: ("t24", 16, 8), 29: ("t24", 16, 9),
    30: ("t24", 16, 11), 31: ("t24", 16, 13),
}


def _build_decode_map(name):
    """(code string -> (x, y) or quad index) as a dict keyed by (len, code)."""
    t = _TABLES["huff"][name]
    return {(l, c): i for i, (c, l) in enumerate(zip(t["codes"], t["lens"]))}


_DEC = {name: _build_decode_map(name) for name in
        ["t1", "t2", "t3", "t5", "t6", "t7", "t8", "t9", "t10", "t11",
         "t12", "t13", "t15", "t16", "t24", "c1A", "c1B"]}


class Bits:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def huff(self, name: str) -> int:
        dec = _DEC[name]
        l, c = 0, 0
        while True:
            c = (c << 1) | int(self.bits[self.pos])
            self.pos += 1
            l += 1
            hit = dec.get((l, c))
            if hit is not None:
                return hit
            if l > 19:
                raise ValueError("bad huffman stream")


def _find_frame(data: bytes, pos: int):
    """Next valid Layer III header at/after pos -> (pos, info) or None."""
    n = len(data)
    while pos + 4 <= n:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            h1, h2, h3 = data[pos + 1], data[pos + 2], data[pos + 3]
            version = (h1 >> 3) & 3     # 0: 2.5, 2: 2, 3: 1
            layer = (h1 >> 1) & 3       # 1 = Layer III
            br_idx = (h2 >> 4) & 15
            sr_idx = (h2 >> 2) & 3
            if version != 1 and layer == 1 and br_idx < 15 and sr_idx < 3:
                lsf = version != 3
                sr = SR_V1[sr_idx]
                if version == 2:
                    sr //= 2
                elif version == 0:
                    sr //= 4
                bitrate = (BITRATES_V2 if lsf else BITRATES_V1)[br_idx] * 1000
                padding = (h2 >> 1) & 1
                # free format (br_idx 0): length measured from the next sync
                frame_len = (0 if br_idx == 0 else
                             (72 if lsf else 144) * bitrate // sr + padding)
                mode = (h3 >> 6) & 3     # 0 st, 1 js, 2 dual, 3 mono
                mode_ext = (h3 >> 4) & 3
                crc = not (h1 & 1)
                return pos, dict(lsf=lsf, mpeg25=version == 0, sr=sr,
                                 frame_len=frame_len, mode=mode,
                                 mode_ext=mode_ext, crc=crc, sr_idx=sr_idx,
                                 padding=padding)
        pos += 1
    return None


def _crc16(data: bytes) -> int:
    """ISO CRC-16 (poly 0x8005, init 0xFFFF) over header+side-info bytes."""
    crc = 0xFFFF
    for byte in data:
        for bit in range(7, -1, -1):
            hi = (crc >> 15) & 1
            crc = (crc << 1) & 0xFFFF
            if hi ^ ((byte >> bit) & 1):
                crc ^= 0x8005
    return crc


def _read_side_info(b: Bits, nch: int, lsf: bool):
    si = {}
    si["main_data_begin"] = b.get(8 if lsf else 9)
    b.get((2 if nch == 2 else 1) if lsf else (3 if nch == 2 else 5))
    if not lsf:
        si["scfsi"] = [[b.get(1) for _ in range(4)] for _ in range(nch)]
    ngr = 1 if lsf else 2
    si["gr"] = []
    for _ in range(ngr):
        chs = []
        for _ in range(nch):
            g = {}
            g["part2_3_length"] = b.get(12)
            g["big_values"] = b.get(9)
            g["global_gain"] = b.get(8)
            g["scalefac_compress"] = b.get(9 if lsf else 4)
            g["wsf"] = b.get(1)
            if g["wsf"]:
                g["block_type"] = b.get(2)
                g["mixed"] = b.get(1)
                g["table_select"] = [b.get(5), b.get(5), 0]
                g["subblock_gain"] = [b.get(3) for _ in range(3)]
                g["region0_count"] = 7 if g["block_type"] != 2 or g["mixed"] else 8
                g["region1_count"] = 36
            else:
                g["block_type"] = 0
                g["mixed"] = 0
                g["table_select"] = [b.get(5) for _ in range(3)]
                g["region0_count"] = b.get(4)
                g["region1_count"] = b.get(3)
                g["subblock_gain"] = [0, 0, 0]
            g["preflag"] = 0 if lsf else b.get(1)
            g["scalefac_scale"] = b.get(1)
            g["count1table_select"] = b.get(1)
            chs.append(g)
        si["gr"].append(chs)
    return si


# MPEG-2 LSF scalefactors (ISO 13818-3): scalefac_compress selects one of
# three slen decompositions, each with its own partition of the scalefactor
# list (by block shape: long / short / mixed). The right channel of an
# intensity-stereo frame uses sc>>1 with the intensity decompositions, and
# an all-ones value in a band means "position invalid" — the per-value slen
# is returned so the stereo stage can detect that.
def _read_scalefacs_lsf(b: Bits, g, intensity: bool = False):
    sc = g["scalefac_compress"]
    shape = 0 if g["block_type"] != 2 else (2 if g["mixed"] else 1)
    if intensity:
        isc = sc >> 1
        if isc < 180:
            slen = [isc // 36, (isc % 36) // 6, isc % 6, 0]
            nr = [[7, 7, 7, 0], [12, 12, 12, 0], [6, 15, 12, 0]][shape]
        elif isc < 244:
            c = isc - 180
            slen = [(c % 64) >> 4, (c % 16) >> 2, c % 4, 0]
            nr = [[6, 6, 6, 3], [12, 9, 9, 6], [6, 12, 9, 6]][shape]
        else:
            c = isc - 244
            slen = [c // 3, c % 3, 0, 0]
            nr = [[8, 8, 5, 0], [15, 12, 9, 0], [6, 18, 9, 0]][shape]
    elif sc < 400:
        slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc % 16) >> 2, sc % 4]
        nr = [[6, 5, 5, 5], [9, 9, 9, 9], [6, 9, 9, 9]][shape]
    elif sc < 500:
        c = sc - 400
        slen = [(c >> 2) // 5, (c >> 2) % 5, c % 4, 0]
        nr = [[6, 5, 7, 3], [9, 9, 12, 6], [6, 9, 12, 6]][shape]
    else:
        c = sc - 500
        slen = [c // 3, c % 3, 0, 0]
        nr = [[11, 10, 0, 0], [18, 18, 0, 0], [15, 18, 0, 0]][shape]
        g["preflag"] = 1
    vals, vslens = [], []
    for n_i, sl in zip(nr, slen):
        for _ in range(n_i):
            vals.append(b.get(sl) if sl else 0)
            vslens.append(sl)
    # scatter the flat list into (long, short) layouts + per-band slens
    long_sf = np.zeros(22, np.int32)
    short_sf = np.zeros((13, 3), np.int32)
    long_sl = np.zeros(22, np.int32)
    short_sl = np.zeros((13, 3), np.int32)
    if g["block_type"] == 2:
        k = 0
        if g["mixed"]:
            for sfb in range(6):
                long_sf[sfb], long_sl[sfb] = vals[k], vslens[k]
                k += 1
            for sfb in range(3, 12):
                for w in range(3):
                    short_sf[sfb][w], short_sl[sfb][w] = vals[k], vslens[k]
                    k += 1
        else:
            for sfb in range(12):
                for w in range(3):
                    short_sf[sfb][w], short_sl[sfb][w] = vals[k], vslens[k]
                    k += 1
    else:
        for sfb in range(min(len(vals), 21)):
            long_sf[sfb] = vals[sfb]
            long_sl[sfb] = vslens[sfb]
    return long_sf, short_sf, long_sl, short_sl


def _read_scalefacs(b: Bits, g, scfsi, gr0_sf, gr_idx):
    """MPEG-1 scalefactors -> (long[21], short[12][3])."""
    s1, s2 = SLEN1[g["scalefac_compress"]], SLEN2[g["scalefac_compress"]]
    long_sf = np.zeros(22, np.int32)
    short_sf = np.zeros((13, 3), np.int32)
    if g["block_type"] == 2:
        if g["mixed"]:
            for sfb in range(8):
                long_sf[sfb] = b.get(s1)
            for sfb in range(3, 6):
                for w in range(3):
                    short_sf[sfb][w] = b.get(s1)
        else:
            for sfb in range(6):
                for w in range(3):
                    short_sf[sfb][w] = b.get(s1)
        for sfb in range(6, 12):
            for w in range(3):
                short_sf[sfb][w] = b.get(s2)
    else:
        groups = [(0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2)]
        for band, (lo, hi, sl) in enumerate(groups):
            if gr_idx == 1 and scfsi[band]:
                long_sf[lo:hi] = gr0_sf[0][lo:hi]
            else:
                for sfb in range(lo, hi):
                    long_sf[sfb] = b.get(sl)
    return long_sf, short_sf


def _huffman_spectrum(b: Bits, g, sfb_long, sfb_short, part2_start):
    """Decode 576 spectral integers (+ signs applied)."""
    xs = np.zeros(576, np.float64)
    if g["wsf"]:
        # region0_count is implicit: 7 long sfbs (start/stop/mixed) or
        # 8 "band units" = 3 short sfbs (pure short); 36 at most rates
        if g["block_type"] == 2 and not g["mixed"]:
            region1 = 3 * sfb_short[3]
        else:
            region1 = sfb_long[8]
        region2 = 576
    else:
        region1 = sfb_long[g["region0_count"] + 1]
        region2 = sfb_long[min(g["region0_count"] + g["region1_count"] + 2, 22)]
    i = 0
    for _ in range(g["big_values"]):
        if i < region1:
            sel = g["table_select"][0]
        elif i < region2:
            sel = g["table_select"][1]
        else:
            sel = g["table_select"][2]
        spec = BV_TABLES[sel]
        if spec is None:
            i += 2
            continue
        name, xlen, linbits = spec
        idx = b.huff(name)
        x, y = idx // xlen, idx % xlen
        if x == 15 and linbits:
            x += b.get(linbits)
        if x:
            if b.get(1):
                x = -x
        if y == 15 and linbits:
            y += b.get(linbits)
        if y:
            if b.get(1):
                y = -y
        xs[i], xs[i + 1] = x, y
        i += 2
    # count1 region
    limit = part2_start + g["part2_3_length"]
    cname = "c1B" if g["count1table_select"] else "c1A"
    while b.pos < limit and i <= 572:
        if g["count1table_select"]:
            quad = 15 - b.get(4)
        else:
            quad = b.huff(cname)
        for j, bit in enumerate([8, 4, 2, 1]):
            v = 1 if (quad & bit) else 0
            if v and b.get(1):
                v = -1
            xs[i + j] = v
        i += 4
    if b.pos > limit:  # overshoot: the last quad was padding
        i -= 4
        xs[i:i + 4] = 0
    b.pos = limit
    return xs


def _mixed_long_sfbs(lsf: bool) -> int:
    """Long sfbs in a mixed block: 8 (MPEG-1) / 6 (LSF, 13818-3)."""
    return 6 if lsf else 8


def _requantize(xs, g, long_sf, short_sf, sfb_long, sfb_short, lsf):
    out = np.sign(xs) * np.abs(xs) ** (4.0 / 3.0)
    sf_mult = 1.0 if g["scalefac_scale"] else 0.5
    gg = g["global_gain"] - 210
    if g["block_type"] == 2:
        long_sfbs = _mixed_long_sfbs(lsf) if g["mixed"] else 0
        n_long = sfb_long[long_sfbs] if g["mixed"] else 0
        first_short_sfb = 3 if g["mixed"] else 0
        # long part (mixed)
        for sfb in range(long_sfbs):
            lo, hi = sfb_long[sfb], sfb_long[sfb + 1]
            e = gg / 4.0 - sf_mult * (long_sf[sfb]
                                      + g["preflag"] * PRETAB[sfb])
            out[lo:hi] *= 2.0 ** e
        for sfb in range(first_short_sfb, 13):
            lo, hi = sfb_short[sfb], sfb_short[sfb + 1]
            n = hi - lo
            for w in range(3):
                e = (gg - 8 * g["subblock_gain"][w]) / 4.0 \
                    - sf_mult * short_sf[sfb][w]
                s = 3 * lo + w * n if not g["mixed"] else \
                    n_long + 3 * (lo - sfb_short[first_short_sfb]) + w * n
                out[s:s + n] *= 2.0 ** e
        return out
    for sfb in range(22):
        lo, hi = sfb_long[sfb], sfb_long[sfb + 1]
        e = gg / 4.0 - sf_mult * (long_sf[sfb] + g["preflag"] * PRETAB[sfb])
        out[lo:hi] *= 2.0 ** e
    return out


def _intensity_positions(xr_r, g, long_sf, short_sf, long_sl, short_sl,
                         sfb_long, sfb_short, lsf):
    """Per-line intensity position + its slen; pos -1 = not in the region.

    Intensity applies to scalefactor bands above the right channel's zero
    boundary; for short blocks the boundary is found per window
    (ISO 11172-3 2.4.3.4.9.3). is_pos is the right channel's scalefactor.
    Operates on the PRE-reorder (Huffman-order) spectrum: short band sfb,
    window w occupies [3*lo + w*n, 3*lo + (w+1)*n).
    """
    pos = np.full(576, -1, np.int32)
    sl = np.zeros(576, np.int32)
    if g["block_type"] == 2:
        start_sfb = 3 if g["mixed"] else 0
        base_off = sfb_long[_mixed_long_sfbs(lsf)] if g["mixed"] else 0

        def short_base(sfb, w):
            lo, n = sfb_short[sfb], sfb_short[sfb + 1] - sfb_short[sfb]
            if g["mixed"]:
                return base_off + 3 * (lo - sfb_short[start_sfb]) + w * n
            return 3 * lo + w * n

        for w in range(3):
            sfbcnt = start_sfb - 1
            for sfb in range(12, start_sfb - 1, -1):
                n = sfb_short[sfb + 1] - sfb_short[sfb]
                base = short_base(sfb, w)
                if np.any(xr_r[base:base + n] != 0):
                    sfbcnt = sfb
                    break
            for sfb in range(sfbcnt + 1, 13):
                n = sfb_short[sfb + 1] - sfb_short[sfb]
                base = short_base(sfb, w)
                pos[base:base + n] = short_sf[min(sfb, 11)][w]
                sl[base:base + n] = short_sl[min(sfb, 11)][w]
    else:
        sfbcnt = -1
        for sfb in range(21, -1, -1):
            if np.any(xr_r[sfb_long[sfb]:sfb_long[sfb + 1]] != 0):
                sfbcnt = sfb
                break
        for sfb in range(sfbcnt + 1, 22):
            pos[sfb_long[sfb]:sfb_long[sfb + 1]] = long_sf[min(sfb, 20)]
            sl[sfb_long[sfb]:sfb_long[sfb + 1]] = long_sl[min(sfb, 20)]
    return pos, sl


def _stereo_process(xr_l, xr_r, g_r, sf_r, mode_ext, sfb_long, sfb_short,
                    lsf):
    """Joint-stereo reconstruction: intensity (MPEG-1 + LSF) and MS."""
    ms = bool(mode_ext & 2)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    if not (mode_ext & 1):
        if ms:
            m, s = xr_l.copy(), xr_r.copy()
            return (m + s) * inv_sqrt2, (m - s) * inv_sqrt2
        return xr_l, xr_r
    long_sf, short_sf, long_sl, short_sl = sf_r
    pos, sl = _intensity_positions(xr_r, g_r, long_sf, short_sf,
                                   long_sl, short_sl, sfb_long, sfb_short,
                                   lsf)
    in_region = pos >= 0
    if lsf:
        # 13818-3: positions are invalid when all slen bits are set; legal
        # ones scale the carrier by io^((p+1)/2) on one side, io from the
        # right granule's scalefac_compress LSB
        illegal = in_region & (sl > 0) & (pos == (1 << sl) - 1)
        it = in_region & ~illegal
        io = 2.0 ** (-0.25 * ((g_r["scalefac_compress"] & 1) + 1))
        p = pos[it]
        k0 = np.where(p % 2 == 1, io ** ((p + 1) // 2), 1.0)
        k1 = np.where(p % 2 == 1, 1.0, io ** (p // 2))
    else:
        illegal = in_region & (pos == 7)
        it = in_region & ~illegal
        ratio = np.tan(pos[it] * (np.pi / 12.0))
        k0 = ratio / (1.0 + ratio)
        k1 = 1.0 / (1.0 + ratio)
    l_out, r_out = xr_l.copy(), xr_r.copy()
    l_out[it] = xr_l[it] * k0
    r_out[it] = xr_l[it] * k1
    if ms:
        rest = ~it
        m, s = xr_l[rest], xr_r[rest]
        l_out[rest] = (m + s) * inv_sqrt2
        r_out[rest] = (m - s) * inv_sqrt2
    return l_out, r_out


def _reorder_short(xr, g, sfb_short, sfb_long, lsf):
    if g["block_type"] != 2:
        return xr
    out = xr.copy()
    start_sfb = 3 if g["mixed"] else 0
    base = sfb_long[_mixed_long_sfbs(lsf)] if g["mixed"] else 0
    src = base
    for sfb in range(start_sfb, 13):
        lo, hi = sfb_short[sfb], sfb_short[sfb + 1]
        n = hi - lo
        dst = 3 * lo
        blockvals = xr[src:src + 3 * n]
        if len(blockvals) < 3 * n:
            break
        for w in range(3):
            out[dst + w::3][:n] = blockvals[w * n:(w + 1) * n]
        src += 3 * n
    return out


def _alias_reduce(xr, g):
    n_bounds = 31 if g["block_type"] != 2 else (1 if g["mixed"] else 0)
    for sb in range(1, n_bounds + 1):
        base = 18 * sb
        for i in range(8):
            a = xr[base - 1 - i]
            c = xr[base + i]
            xr[base - 1 - i] = a * _CS[i] - c * _CA[i]
            xr[base + i] = c * _CS[i] + a * _CA[i]
    return xr


_IMDCT36 = np.asarray([[np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
                        for k in range(18)] for i in range(36)])
_IMDCT12 = np.asarray([[np.cos(np.pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
                        for k in range(6)] for i in range(12)])
_WIN12 = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))


def _window(block_type):
    i = np.arange(36)
    w = np.sin(np.pi / 36.0 * (i + 0.5))
    if block_type == 1:
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12.0 * (i[24:30] - 18 + 0.5))
        w[30:] = 0.0
    elif block_type == 3:
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12.0 * (i[6:12] - 6 + 0.5))
        w[12:18] = 1.0
    return w


_WINDOWS = {bt: _window(bt) for bt in (0, 1, 3)}


def _imdct_granule(xr, g, overlap):
    """xr (576,) -> 576 time samples via per-subband IMDCT + overlap-add.

    overlap: (32, 18) state, updated in place.
    """
    out = np.zeros((32, 18))
    for sb in range(32):
        spec = xr[18 * sb:18 * (sb + 1)]
        bt = g["block_type"]
        if bt == 2 and g["mixed"] and sb < 2:
            bt = 0
        if bt == 2:
            blk = np.zeros(36)
            for w in range(3):
                y = _IMDCT12 @ spec[w::3]
                blk[6 + 6 * w:18 + 6 * w] += y * _WIN12
        else:
            blk = (_IMDCT36 @ spec) * _WINDOWS[bt]
        out[sb] = blk[:18] + overlap[sb]
        overlap[sb] = blk[18:]
        if sb % 2 == 1:  # frequency inversion of odd subbands
            out[sb][1::2] = -out[sb][1::2]
    return out  # (32 subbands, 18 time slots)


_NMAT = np.asarray([[np.cos((16 + i) * (2 * k + 1) * np.pi / 64.0)
                     for k in range(32)] for i in range(64)])


class Synth:
    """ISO polyphase synthesis filterbank (V/U/W formulation)."""

    def __init__(self, dwin):
        self.v = np.zeros(1024)
        self.d = dwin

    def run(self, s):
        """s: (32,) subband samples -> (32,) PCM."""
        self.v[64:] = self.v[:-64]
        self.v[:64] = _NMAT @ s
        u = np.empty(512)
        for j in range(8):
            u[j * 64:j * 64 + 32] = self.v[j * 128:j * 128 + 32]
            u[j * 64 + 32:j * 64 + 64] = self.v[j * 128 + 96:j * 128 + 128]
        w = u * self.d
        return w.reshape(16, 32).sum(axis=0)


def build_dwin():
    """512-tap synthesis window from the 257-entry half table."""
    base = np.asarray(_TABLES["intwinbase"], np.float64) / 65536.0
    d = np.empty(512)
    d[:257] = base
    d[257:] = base[255:0:-1]
    # ISO D window sign structure: the half-table mirrors positively and
    # every other 64-tap block is negated (verified numerically: corr 1.0
    # vs libmpg123 synthesis; see tests/test_mp3.py)
    sgn = np.ones(512)
    for j in range(1, 8, 2):
        sgn[j * 64:(j + 1) * 64] = -1.0
    return d * sgn


def decode(data: bytes):
    """mp3 bytes -> (pcm float32 (channels, n), sample_rate)."""
    pos = 0
    reservoir = b""
    first = _find_frame(data, 0)
    if first is None:
        raise ValueError("no mp3 frame found")
    info0 = first[1]
    nch = 1 if info0["mode"] == 3 else 2
    sr = info0["sr"]
    sfb_long = np.asarray(_TABLES["sfb"][str(sr)]["long"], np.int64)
    sfb_short = np.asarray(_TABLES["sfb"][str(sr)]["short"], np.int64)
    dwin = build_dwin()
    synth = [Synth(dwin) for _ in range(nch)]
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    pcm = [[] for _ in range(nch)]

    pos = first[0]
    free_base = 0
    while True:
        f = _find_frame(data, pos)
        if f is None:
            break
        fpos, info = f
        if info["sr"] != sr or (1 if info["mode"] == 3 else 2) != nch:
            break
        if info["frame_len"] == 0:  # free format: measure to the next sync
            if not free_base:
                # skip false syncs: next header must be a matching
                # free-format header of the same stream
                p2 = fpos + 4
                while True:
                    nxt = _find_frame(data, p2)
                    if nxt is None:
                        break
                    if (nxt[1]["frame_len"] == 0 and nxt[1]["sr"] == sr
                            and nxt[1]["mode"] == info["mode"]
                            and nxt[1]["lsf"] == info["lsf"]):
                        break
                    p2 = nxt[0] + 1
                if nxt is None:
                    break
                free_base = nxt[0] - fpos - info["padding"]
            info["frame_len"] = free_base + info["padding"]
        frame = data[fpos:fpos + info["frame_len"]]
        if len(frame) < info["frame_len"]:
            break
        pos = fpos + info["frame_len"]
        off = 4 + (2 if info["crc"] else 0)
        lsf = info["lsf"]
        side_len = (9 if nch == 1 else 17) if lsf else (17 if nch == 1 else 32)
        if info["crc"] and _crc16(frame[2:4] + frame[6:6 + side_len]) != \
                int.from_bytes(frame[4:6], "big"):
            continue  # corrupt side info: drop the frame
        sb = Bits(frame[off:off + side_len])
        si = _read_side_info(sb, nch, lsf)
        main = frame[off + side_len:]

        if si["main_data_begin"] > len(reservoir):
            # can't reconstruct main data (stream start): skip frame
            reservoir = (reservoir + main)[-4096:]
            continue
        md = (reservoir[len(reservoir) - si["main_data_begin"]:]
              if si["main_data_begin"] else b"") + main
        reservoir = (reservoir + main)[-4096:]

        b = Bits(md)
        gr0_sf = {}
        for gr_idx, chs in enumerate(si["gr"]):
            xr_ch = []
            sf_ch = []
            for ch, g in enumerate(chs):
                part2_start = b.pos
                if lsf:
                    intensity = (nch == 2 and info["mode"] == 1
                                 and bool(info["mode_ext"] & 1) and ch == 1)
                    long_sf, short_sf, long_sl, short_sl = \
                        _read_scalefacs_lsf(b, g, intensity)
                else:
                    long_sf, short_sf = _read_scalefacs(
                        b, g, si["scfsi"][ch], gr0_sf.get(ch), gr_idx)
                    gr0_sf.setdefault(ch, (long_sf, short_sf))
                    gr0_sf[ch] = (long_sf, short_sf)
                    long_sl = np.zeros(22, np.int32)
                    short_sl = np.zeros((13, 3), np.int32)
                xs = _huffman_spectrum(b, g, sfb_long, sfb_short, part2_start)
                xr = _requantize(xs, g, long_sf, short_sf, sfb_long,
                                 sfb_short, lsf)
                xr_ch.append(xr)
                sf_ch.append((long_sf, short_sf, long_sl, short_sl))

            if nch == 2 and info["mode"] == 1:
                left, right = _stereo_process(
                    xr_ch[0], xr_ch[1], chs[1], sf_ch[1],
                    info["mode_ext"], sfb_long, sfb_short, lsf)
                xr_ch = [left, right]

            for ch, g in enumerate(chs):
                xr = _reorder_short(xr_ch[ch], g, sfb_short, sfb_long, lsf)
                xr = _alias_reduce(xr, g)
                tsub = _imdct_granule(xr, g, overlap[ch])  # (32, 18)
                for t in range(18):
                    pcm[ch].append(synth[ch].run(tsub[:, t]))

    out = np.asarray([np.concatenate(c) if c else np.zeros(0) for c in pcm],
                     np.float32)
    return out, sr
