"""Generate the ISO 11172-3 constant tables for the native mp3 decoder.

The MPEG-1/2 Layer III constants (Huffman code tables B.7, scalefactor band
tables B.8, pretab, and the synthesis-window prototype) are normative spec
data — every decoder must carry byte-identical copies. This script recovers
them from the system codec libraries (libmp3lame / libmpg123 .rodata) and
VALIDATES each Huffman table by Kraft-sum + prefix-freeness before emitting:

- native/mp3_tables.h      (C++ header for native/eat_mp3.cpp)
- tests/data/mp3_tables.json  (for the numpy reference decoder in tests)

Every published Layer III decoder embeds these same numbers; extraction from
the system libraries is just a reliable way to type them in. Run once per
toolchain; outputs are committed.
"""

from __future__ import annotations

import json
import os
import struct
import sys

LAME = "/lib/x86_64-linux-gnu/libmp3lame.so.0"
MPG = "/lib/x86_64-linux-gnu/libmpg123.so.0"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def kraft_prefix_ok(codes, lens):
    if len(codes) != len(lens):
        return False
    if any(l <= 0 or l > 19 for l in lens):
        return False
    if abs(sum(2.0 ** -l for l in lens) - 1.0) > 1e-9:
        return False
    items = sorted(format(c, "0%db" % l) for c, l in zip(codes, lens))
    if len(set(items)) != len(items):
        return False
    return all(not b.startswith(a) for a, b in zip(items, items[1:]))


def extract(lame: bytes, mpg: bytes):
    def u16s(off, n):
        return list(struct.unpack_from("<%dH" % n, lame, off))

    def u8s(off, n):
        return list(struct.unpack_from("<%dB" % n, lame, off))

    def find(data, pat):
        i = data.find(pat)
        assert i != -1
        return i

    # --- big-values Huffman tables -------------------------------------
    # anchor: t5HB (Kraft-validated independent recall), then walk the
    # contiguous descending layout; every (codes, lens) pair must pass the
    # Kraft/prefix validator, which fails on any misalignment.
    t5_off = find(lame, struct.pack("<16H", 1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0))
    t5l_off = find(lame, struct.pack("<16B", 1, 4, 7, 8, 4, 5, 8, 9, 7, 8, 9, 10, 8, 8, 9, 10))

    # (name, xlen, esc_linbits_in_lens)
    specs = [("t1", 2, 0), ("t2", 3, 0), ("t3", 3, 0), ("t5", 4, 0),
             ("t6", 4, 0), ("t7", 6, 0), ("t8", 6, 0), ("t9", 6, 0),
             ("t10", 8, 0), ("t11", 8, 0), ("t12", 8, 0), ("t13", 16, 0),
             ("t15", 16, 0), ("t16", 16, 1), ("t24", 16, 0)]
    # observed layout (descending from later anchors); verified by validation
    code_offs = {"t1": t5_off + 88, "t2": t5_off + 64, "t3": t5_off + 32,
                 "t5": t5_off, "t6": t5_off - 32}
    len_offs = {"t1": t5l_off + 41, "t2": t5l_off + 32, "t3": t5l_off + 16,
                "t5": t5l_off, "t6": t5l_off - 16}
    # walk down for the rest, with alignment slack, validating each pair
    walk = ["t7", "t8", "t9", "t10", "t11", "t12", "t13", "t15", "t16", "t24"]
    prev_c, prev_l = code_offs["t6"], len_offs["t6"]
    tables = {}
    for name, xlen, lb in specs:
        n = xlen * xlen
        if name in code_offs:
            codes = u16s(code_offs[name], n)
            raw = u8s(len_offs[name], n)
            lens = [raw[x * xlen + y] - (x > 0) - (y > 0)
                    for x in range(xlen) for y in range(xlen)]
            assert kraft_prefix_ok(codes, lens), name
            tables[name] = (codes, lens)
    for name in walk:
        xlen = dict((s[0], s[1]) for s in specs)[name]
        lb = dict((s[0], s[2]) for s in specs)[name]
        n = xlen * xlen
        got = None
        for cslack in range(0, 128, 2):
            cs = prev_c - 2 * n - cslack
            codes = u16s(cs, n)
            for lslack in range(0, 9 * 256 + 128):
                ls = prev_l - n - lslack
                raw = u8s(ls, n)
                lens = [raw[x * xlen + y] - (x > 0) - (y > 0)
                        - lb * ((x == 15) + (y == 15))
                        for x in range(xlen) for y in range(xlen)]
                if kraft_prefix_ok(codes, lens):
                    got = (cs, ls, codes, lens)
                    break
            if got:
                break
        assert got, name
        prev_c, prev_l, codes, lens = got
        tables[name] = (codes, lens)

    # --- count1 tables --------------------------------------------------
    # table A: hlens confirmed against lame's sign-inclusive array; codes are
    # the spec assignment (Kraft/prefix-validated; runtime-verified vs mpg123)
    c1a_codes = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]
    c1a_lens = [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]
    raw = [l + bin(i).count("1") for i, (l) in enumerate(c1a_lens)]
    assert lame.find(struct.pack("<16B", *raw)) != -1, "count1-A lens not confirmed"
    assert kraft_prefix_ok(c1a_codes, c1a_lens)
    tables["c1A"] = (c1a_codes, c1a_lens)
    # table B: all 4-bit, code = bitwise-not of the quad value
    tables["c1B"] = ([15 - i for i in range(16)], [4] * 16)

    # --- scalefactor bands (9 rates), pretab, synthesis window ----------
    sfb44 = [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
             162, 196, 238, 288, 342, 418, 576]
    base = find(lame, struct.pack("<23i", *sfb44)) - 3 * 204
    order = ["22050", "24000", "16000", "44100", "48000", "32000",
             "11025", "12000", "8000"]
    sfb = {}
    for i, sr in enumerate(order):
        off = base + i * 204
        l = list(struct.unpack_from("<23i", lame, off))
        s = list(struct.unpack_from("<14i", lame, off + 92))
        assert l[0] == 0 and l[-1] == 576 and all(a < b for a, b in zip(l, l[1:])), sr
        assert s[0] == 0 and s[-1] == 192 and all(a < b for a, b in zip(s, s[1:])), sr
        sfb[sr] = {"long": l, "short": s}

    pretab = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
    assert mpg.find(bytes(pretab)) != -1, "pretab not confirmed"

    win_off = find(mpg, struct.pack("<8q", 0, -1, -1, -1, -1, -1, -1, -2))
    intwin = list(struct.unpack_from("<257q", mpg, win_off))
    assert intwin[256] == max(intwin)

    return tables, sfb, pretab, intwin


def emit(tables, sfb, pretab, intwin):
    j = {"huff": {k: {"codes": v[0], "lens": v[1]} for k, v in tables.items()},
         "sfb": sfb, "pretab": pretab, "intwinbase": intwin}
    jpath = os.path.join(HERE, "tests", "data", "mp3_tables.json")
    os.makedirs(os.path.dirname(jpath), exist_ok=True)
    with open(jpath, "w") as f:
        json.dump(j, f)

    def carr(t, name, vals, per=16):
        rows = [", ".join(str(v) for v in vals[i:i + per])
                for i in range(0, len(vals), per)]
        return f"static const {t} {name}[{len(vals)}] = {{\n  " + \
            ",\n  ".join(rows) + "\n};\n"

    out = ["// GENERATED by scripts/gen_mp3_tables.py — ISO/IEC 11172-3",
           "// normative constants (Huffman tables B.7, scalefactor bands B.8,",
           "// pretab, synthesis window prototype). Do not edit by hand.",
           "#pragma once", "#include <cstdint>", ""]
    for name in ["t1", "t2", "t3", "t5", "t6", "t7", "t8", "t9", "t10",
                 "t11", "t12", "t13", "t15", "t16", "t24", "c1A", "c1B"]:
        codes, lens = tables[name]
        out.append(carr("uint16_t", f"k_{name}_codes", codes))
        out.append(carr("uint8_t", f"k_{name}_lens", lens))
    order = ["44100", "48000", "32000", "22050", "24000", "16000",
             "11025", "12000", "8000"]
    long_flat = sum((sfb[sr]["long"] for sr in order), [])
    short_flat = sum((sfb[sr]["short"] for sr in order), [])
    out.append("// sfb tables, rate order: 44100,48000,32000,22050,24000,"
               "16000,11025,12000,8000")
    out.append(carr("int16_t", "k_sfb_long", long_flat, per=23))
    out.append(carr("int16_t", "k_sfb_short", short_flat, per=14))
    out.append(carr("uint8_t", "k_pretab", pretab))
    out.append("// synthesis window prototype: D[i] = k_intwin[i] / 65536.0")
    out.append(carr("int32_t", "k_intwin", intwin, per=10))
    hpath = os.path.join(HERE, "native", "mp3_tables.h")
    with open(hpath, "w") as f:
        f.write("\n".join(out))
    print("wrote", jpath, "and", hpath)


if __name__ == "__main__":
    with open(LAME, "rb") as f:
        lame = f.read()
    with open(MPG, "rb") as f:
        mpg = f.read()
    tables, sfb, pretab, intwin = extract(lame, mpg)
    print("validated tables:", sorted(tables))
    emit(tables, sfb, pretab, intwin)
