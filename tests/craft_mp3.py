"""Hand-crafted Layer III frames for decoder paths no encoder emits.

LAME never produces mixed_block_flag=1 granules, so the mixed-block
requantize/reorder/IMDCT paths can't be exercised with encoded fixtures.
These builders emit minimal spec-valid frames bit by bit; tests decode
them with libmpg123 as the oracle.
"""

from __future__ import annotations


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self, pad_to: int = 0) -> bytes:
        bits = self.bits + [0] * ((-len(self.bits)) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        if pad_to:
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


def _t1_pair_bits(w: BitWriter, x: int, y: int, sx: int = 0, sy: int = 0):
    """Huffman table 1 codes: (0,0)=1, (0,1)=001, (1,0)=01, (1,1)=000."""
    code = {(0, 0): (1, 1), (0, 1): (1, 3), (1, 0): (1, 2), (1, 1): (0, 3)}
    c, l = code[(x, y)]
    w.put(c, l)
    if x:
        w.put(sx, 1)
    if y:
        w.put(sy, 1)


def craft_mixed_mpeg1(n_frames: int = 8) -> bytes:
    """32 kHz mono 128 kbps MPEG-1 frames; granule 0 is a MIXED block
    (wsf=1, bt=2, mixed=1) with nonzero long+short scalefactors and 16
    table-1 pairs of big values; granule 1 is an empty long block."""
    # scalefactors: sc=15 -> slen1=4, slen2=3 (long 0..7 + short 3..5 use
    # slen1; short 6..11 use slen2)
    sc, s1, s2 = 15, 4, 3
    part2 = 8 * s1 + 9 * s1 + 18 * s2
    n_pairs = 48
    part2_3 = part2 + n_pairs * 5  # each (1,1) pair: 3-bit code + 2 signs

    frames = []
    for _ in range(n_frames):
        w = BitWriter()
        # header: MPEG1 layer III no-crc, 128k, 32kHz, mono
        w.put(0x7FF, 11)
        w.put(3, 2)      # version 1
        w.put(1, 2)      # layer III
        w.put(1, 1)      # no crc
        w.put(9, 4)      # 128 kbps
        w.put(2, 2)      # 32 kHz
        w.put(0, 1)      # padding
        w.put(0, 1)      # private
        w.put(3, 2)      # mono
        w.put(0, 2)      # mode_ext
        w.put(0, 4)      # copy/orig/emphasis
        # side info (mono, 17 bytes)
        w.put(0, 9)      # main_data_begin
        w.put(0, 5)      # private
        w.put(0, 4)      # scfsi
        # granule 0: mixed block
        w.put(part2_3, 12)
        w.put(n_pairs, 9)
        w.put(170, 8)    # global_gain
        w.put(sc, 4)
        w.put(1, 1)      # wsf
        w.put(2, 2)      # block_type short
        w.put(1, 1)      # MIXED
        w.put(1, 5)      # table_select[0] = t1
        w.put(1, 5)      # table_select[1]
        w.put(1, 3)      # subblock_gain
        w.put(2, 3)
        w.put(0, 3)
        w.put(0, 1)      # preflag
        w.put(1, 1)      # scalefac_scale
        w.put(0, 1)      # count1table_select
        # granule 1: silent long block
        w.put(0, 12)
        w.put(0, 9)
        w.put(0, 8)
        w.put(0, 4)
        w.put(0, 1)      # wsf=0
        w.put(0, 15)     # table_select x3
        w.put(0, 4)      # region0
        w.put(0, 3)      # region1
        w.put(0, 1)      # preflag
        w.put(0, 1)      # scalefac_scale
        w.put(0, 1)      # count1table
        # main data: granule 0 scalefactors
        for sfb in range(8):
            w.put((sfb + 1) % (1 << s1), s1)          # long sfbs 0..7
        for sfb in range(3, 6):
            for win in range(3):
                w.put((sfb + win) % (1 << s1), s1)    # short sfbs 3..5
        for sfb in range(6, 12):
            for win in range(3):
                w.put((sfb - win) % (1 << s2), s2)    # short sfbs 6..11
        # 16 pairs of (1,1) with alternating signs
        for i in range(n_pairs):
            _t1_pair_bits(w, 1, 1, i & 1, (i >> 1) & 1)
        frames.append(w.bytes(pad_to=576))
    return b"".join(frames)


def craft_mixed_lsf(n_frames: int = 8) -> bytes:
    """16 kHz mono 32 kbps MPEG-2 (LSF) frames with a MIXED-block granule."""
    # sc=202 -> slen=(2,2,2,2); mixed partitions nr=[6,9,9,9]: 6 long sfbs
    # then short sfbs 3..11
    sc = 202
    part2 = 6 * 2 + 9 * 2 + 9 * 2 + 9 * 2
    n_pairs = 48
    part2_3 = part2 + n_pairs * 5

    frames = []
    for _ in range(n_frames):
        w = BitWriter()
        w.put(0x7FF, 11)
        w.put(2, 2)      # version 2 (LSF)
        w.put(1, 2)      # layer III
        w.put(1, 1)      # no crc
        w.put(4, 4)      # 32 kbps
        w.put(2, 2)      # 16 kHz
        w.put(0, 1)
        w.put(0, 1)
        w.put(3, 2)      # mono
        w.put(0, 2)
        w.put(0, 4)
        # side info (LSF mono, 9 bytes)
        w.put(0, 8)      # main_data_begin
        w.put(0, 1)      # private
        w.put(part2_3, 12)
        w.put(n_pairs, 9)
        w.put(170, 8)    # global_gain
        w.put(sc, 9)
        w.put(1, 1)      # wsf
        w.put(2, 2)      # short
        w.put(1, 1)      # MIXED
        w.put(1, 5)
        w.put(1, 5)
        w.put(1, 3)
        w.put(2, 3)
        w.put(0, 3)
        w.put(1, 1)      # scalefac_scale
        w.put(0, 1)      # count1table_select
        # main data: LSF mixed scalefactors: 6 long + 27 short, 2 bits each
        for k in range(33):
            w.put((k % 3) + 1, 2)
        for i in range(n_pairs):
            _t1_pair_bits(w, 1, 1, i & 1, (i >> 1) & 1)
        frames.append(w.bytes(pad_to=144))
    return b"".join(frames)
