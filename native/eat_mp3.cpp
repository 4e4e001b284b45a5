// First-party MPEG-1/2/2.5 Layer III decoder (host data path).
//
// The reference framework decodes its mp3-in-HDF5 datasets through
// PyAV/FFmpeg (datasets/audioset.py:32-47); this is the zero-dependency
// native equivalent. Written against the ISO/IEC 11172-3 / 13818-3 decode
// algorithm; normative constants in mp3_tables.h (see
// scripts/gen_mp3_tables.py). Developed against the executable numpy spec
// tests/mp3_ref.py and verified to ~1e-6 against libmpg123 float output
// across sample rates / channel modes / bitrates (tests/test_mp3.py).
//
// Supports: MPEG-1 + MPEG-2/2.5 (LSF), mono/stereo/dual/MS joint stereo,
// intensity stereo (both the MPEG-1 tan-ratio and the LSF io-power
// variants), long/short/start/stop/mixed blocks, bit reservoir, CBR + VBR.
//
// API (ctypes-bound in efficientat_tpu/data/native.py):
//   eat_mp3_decode(data, n, &out, &n_samples, &sr, &channels) -> 0 on ok
//   out: planar float32 (channels * n_samples), caller frees via eat_free.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "mp3_tables.h"

namespace {

// ------------------------------------------------------------------ tables

struct HuffTable {
    // binary trie: node = pair of int32; >=0: next node index, <0: ~value
    std::vector<int32_t> trie;
    void build(const uint16_t* codes, const uint8_t* lens, int n) {
        trie.assign(2, -0x7fffffff);
        for (int v = 0; v < n; v++) {
            int node = 0;
            for (int b = lens[v] - 1; b >= 0; b--) {
                int bit = (codes[v] >> b) & 1;
                if (b == 0) {
                    trie[node * 2 + bit] = ~v;
                } else {
                    int next = trie[node * 2 + bit];
                    if (next == -0x7fffffff) {
                        next = (int32_t)(trie.size() / 2);
                        trie[node * 2 + bit] = next;
                        trie.push_back(-0x7fffffff);
                        trie.push_back(-0x7fffffff);
                    }
                    node = next;
                }
            }
        }
    }
};

struct BigValueTable {
    const HuffTable* huff;
    int xlen;
    int linbits;
};

struct Tables {
    HuffTable h[17];  // t1..t24 (13 used) + c1A + c1B
    BigValueTable bv[32];
    double imdct36[36][18];
    double imdct12[12][6];
    double win[4][36];   // block types 0,1,2(unused),3
    double win12[12];
    double nmat[64][32];
    double dwin[512];
    double cs[8], ca[8];
    double pow43[8207];  // |x|^(4/3) for 0..8206 (15 + 2^13 - 1 max)

    Tables() {
        struct Spec { int id; const uint16_t* c; const uint8_t* l; int n; };
        const Spec specs[] = {
            {0, k_t1_codes, k_t1_lens, 4},    {1, k_t2_codes, k_t2_lens, 9},
            {2, k_t3_codes, k_t3_lens, 9},    {3, k_t5_codes, k_t5_lens, 16},
            {4, k_t6_codes, k_t6_lens, 16},   {5, k_t7_codes, k_t7_lens, 36},
            {6, k_t8_codes, k_t8_lens, 36},   {7, k_t9_codes, k_t9_lens, 36},
            {8, k_t10_codes, k_t10_lens, 64}, {9, k_t11_codes, k_t11_lens, 64},
            {10, k_t12_codes, k_t12_lens, 64},{11, k_t13_codes, k_t13_lens, 256},
            {12, k_t15_codes, k_t15_lens, 256},{13, k_t16_codes, k_t16_lens, 256},
            {14, k_t24_codes, k_t24_lens, 256},
            {15, k_c1A_codes, k_c1A_lens, 16},{16, k_c1B_codes, k_c1B_lens, 16},
        };
        for (const Spec& s : specs) h[s.id].build(s.c, s.l, s.n);
        auto set = [&](int sel, int hid, int xlen, int lb) {
            bv[sel] = {hid < 0 ? nullptr : &h[hid], xlen, lb};
        };
        set(0, -1, 0, 0); set(4, -1, 0, 0); set(14, -1, 0, 0);
        set(1, 0, 2, 0); set(2, 1, 3, 0); set(3, 2, 3, 0);
        set(5, 3, 4, 0); set(6, 4, 4, 0); set(7, 5, 6, 0);
        set(8, 6, 6, 0); set(9, 7, 6, 0); set(10, 8, 8, 0);
        set(11, 9, 8, 0); set(12, 10, 8, 0); set(13, 11, 16, 0);
        set(15, 12, 16, 0);
        const int lb16[] = {1, 2, 3, 4, 6, 8, 10, 13};
        const int lb24[] = {4, 5, 6, 7, 8, 9, 11, 13};
        for (int i = 0; i < 8; i++) { set(16 + i, 13, 16, lb16[i]);
                                      set(24 + i, 14, 16, lb24[i]); }

        const double pi = 3.14159265358979323846;
        for (int i = 0; i < 36; i++)
            for (int k = 0; k < 18; k++)
                imdct36[i][k] = std::cos(pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1));
        for (int i = 0; i < 12; i++)
            for (int k = 0; k < 6; k++)
                imdct12[i][k] = std::cos(pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1));
        for (int i = 0; i < 12; i++)
            win12[i] = std::sin(pi / 12.0 * (i + 0.5));
        for (int i = 0; i < 36; i++) {
            double w0 = std::sin(pi / 36.0 * (i + 0.5));
            win[0][i] = w0; win[1][i] = w0; win[3][i] = w0; win[2][i] = 0.0;
        }
        for (int i = 18; i < 24; i++) win[1][i] = 1.0;
        for (int i = 24; i < 30; i++)
            win[1][i] = std::sin(pi / 12.0 * (i - 18 + 0.5));
        for (int i = 30; i < 36; i++) win[1][i] = 0.0;
        for (int i = 0; i < 6; i++) win[3][i] = 0.0;
        for (int i = 6; i < 12; i++)
            win[3][i] = std::sin(pi / 12.0 * (i - 6 + 0.5));
        for (int i = 12; i < 18; i++) win[3][i] = 1.0;
        for (int i = 0; i < 64; i++)
            for (int k = 0; k < 32; k++)
                nmat[i][k] = std::cos((16 + i) * (2 * k + 1) * pi / 64.0);
        // synthesis window: positive mirror of the 257-entry half table with
        // every other 64-tap block negated (validated vs libmpg123)
        for (int i = 0; i < 257; i++) dwin[i] = k_intwin[i] / 65536.0;
        for (int i = 257; i < 512; i++) dwin[i] = k_intwin[512 - i] / 65536.0;
        for (int j = 1; j < 8; j += 2)
            for (int i = 0; i < 64; i++) dwin[j * 64 + i] = -dwin[j * 64 + i];
        const double ci[8] = {-0.6, -0.535, -0.33, -0.185,
                              -0.095, -0.041, -0.0142, -0.0037};
        for (int i = 0; i < 8; i++) {
            cs[i] = 1.0 / std::sqrt(1.0 + ci[i] * ci[i]);
            ca[i] = ci[i] / std::sqrt(1.0 + ci[i] * ci[i]);
        }
        for (int i = 0; i < 8207; i++)
            pow43[i] = std::pow((double)i, 4.0 / 3.0);
    }
};

const Tables& tables() {
    static const Tables t;
    return t;
}

// --------------------------------------------------------------- bitstream

struct Bits {
    const uint8_t* data;
    int64_t nbits;
    int64_t nbytes;
    int64_t pos = 0;
    Bits(const uint8_t* d, int64_t nb) : data(d), nbits(nb * 8), nbytes(nb) {}

    // Peek up to 24 bits, zero-padded past the end (same semantics the
    // bit-by-bit reader had: reads beyond the buffer return 0 bits).
    uint32_t peek(int n) const {
        int64_t by = pos >> 3;
        int off = pos & 7;
        uint64_t w;
        if (by + 8 <= nbytes) {  // one unaligned load + byte swap
            std::memcpy(&w, data + by, 8);
#if defined(__GNUC__) || defined(__clang__)
            w = __builtin_bswap64(w);
#else
            w = ((w & 0xffull) << 56) | ((w & 0xff00ull) << 40)
              | ((w & 0xff0000ull) << 24) | ((w & 0xff000000ull) << 8)
              | ((w >> 8) & 0xff000000ull) | ((w >> 24) & 0xff0000ull)
              | ((w >> 40) & 0xff00ull) | (w >> 56);
#endif
        } else {
            w = 0;
            for (int i = 0; i < 8; i++)
                w = (w << 8) | (by + i < nbytes ? (uint64_t)data[by + i] : 0);
        }
        return (uint32_t)((w << off) >> (64 - n));
    }

    int get1() {
        if (pos >= nbits) { pos++; return 0; }
        int v = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        return v;
    }
    uint32_t get(int n) {
        if (n == 0) return 0;
        uint32_t v = peek(n);
        pos += n;
        return v;
    }
    // Trie walk fed from a single 24-bit peek (max code length 19). A
    // 10-bit first-level LUT decode was measured SLOWER here (77 vs 92
    // clips/s on the 64 kbps bench clip): at audio-tagging bitrates most
    // symbols are 1-3 bit codes and the LUT pays 68 KB of tables; the
    // register walk keeps the small trie but drops the per-bit byte
    // loads and bounds checks of get1().
    int huff(const HuffTable& t) {
        uint32_t w = peek(24);
        int node = 0, used = 0;
        while (used < 20) {
            int32_t slot = t.trie[node * 2 + ((w >> (23 - used)) & 1)];
            used++;
            if (slot == -0x7fffffff) break;
            if (slot < 0) { pos += used; return ~slot; }
            node = slot;
        }
        pos += used;
        return -1;
    }
};

// ------------------------------------------------------------- frame parse

struct FrameInfo {
    bool lsf, mpeg25, crc;
    int sr, sr_idx, frame_len, mode, mode_ext, padding;
    // frame_len == 0: free-format stream (bitrate index 0) — the caller
    // derives the constant frame size from the next sync position
};

const int kBitratesV1[] = {0, 32, 40, 48, 56, 64, 80, 96, 112,
                           128, 160, 192, 224, 256, 320};
const int kBitratesV2[] = {0, 8, 16, 24, 32, 40, 48, 56, 64,
                           80, 96, 112, 128, 144, 160};
const int kSrV1[] = {44100, 48000, 32000};

bool find_frame(const uint8_t* d, int64_t n, int64_t& pos, FrameInfo& fi) {
    while (pos + 4 <= n) {
        if (d[pos] == 0xFF && (d[pos + 1] & 0xE0) == 0xE0) {
            int h1 = d[pos + 1], h2 = d[pos + 2], h3 = d[pos + 3];
            int version = (h1 >> 3) & 3, layer = (h1 >> 1) & 3;
            int br_idx = (h2 >> 4) & 15, sr_idx = (h2 >> 2) & 3;
            if (version != 1 && layer == 1 && br_idx < 15 && sr_idx < 3) {
                fi.lsf = version != 3;
                fi.mpeg25 = version == 0;
                fi.sr = kSrV1[sr_idx];
                if (version == 2) fi.sr /= 2;
                if (version == 0) fi.sr /= 4;
                fi.sr_idx = sr_idx;
                fi.padding = (h2 >> 1) & 1;
                int bitrate = (fi.lsf ? kBitratesV2 : kBitratesV1)[br_idx] * 1000;
                fi.frame_len = br_idx == 0 ? 0
                    : (fi.lsf ? 72 : 144) * bitrate / fi.sr + fi.padding;
                fi.mode = (h3 >> 6) & 3;
                fi.mode_ext = (h3 >> 4) & 3;
                fi.crc = !(h1 & 1);
                return true;
            }
        }
        pos++;
    }
    return false;
}

struct Granule {
    int part2_3_length, big_values, global_gain, scalefac_compress;
    int wsf, block_type, mixed, table_select[3], subblock_gain[3];
    int region0_count, region1_count, preflag, scalefac_scale;
    int count1table_select;
};

struct SideInfo {
    int main_data_begin;
    int scfsi[2][4];
    Granule gr[2][2];  // [granule][channel]
    int ngr;
};

void read_side_info(Bits& b, int nch, bool lsf, SideInfo& si) {
    si.main_data_begin = b.get(lsf ? 8 : 9);
    b.get(lsf ? (nch == 2 ? 2 : 1) : (nch == 2 ? 3 : 5));
    if (!lsf)
        for (int ch = 0; ch < nch; ch++)
            for (int i = 0; i < 4; i++) si.scfsi[ch][i] = b.get1();
    si.ngr = lsf ? 1 : 2;
    for (int gr = 0; gr < si.ngr; gr++)
        for (int ch = 0; ch < nch; ch++) {
            Granule& g = si.gr[gr][ch];
            g.part2_3_length = b.get(12);
            g.big_values = b.get(9);
            g.global_gain = b.get(8);
            g.scalefac_compress = b.get(lsf ? 9 : 4);
            g.wsf = b.get1();
            if (g.wsf) {
                g.block_type = b.get(2);
                g.mixed = b.get1();
                g.table_select[0] = b.get(5);
                g.table_select[1] = b.get(5);
                g.table_select[2] = 0;
                for (int w = 0; w < 3; w++) g.subblock_gain[w] = b.get(3);
                g.region0_count = (g.block_type == 2 && !g.mixed) ? 8 : 7;
                g.region1_count = 36;
            } else {
                g.block_type = 0;
                g.mixed = 0;
                for (int r = 0; r < 3; r++) g.table_select[r] = b.get(5);
                g.region0_count = b.get(4);
                g.region1_count = b.get(3);
                g.subblock_gain[0] = g.subblock_gain[1] = g.subblock_gain[2] = 0;
            }
            g.preflag = lsf ? 0 : b.get1();
            g.scalefac_scale = b.get1();
            g.count1table_select = b.get1();
        }
}

// ------------------------------------------------------------ scalefactors

const int kSlen1[] = {0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4};
const int kSlen2[] = {0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3};

struct ScaleFacs {
    int l[22];
    int s[13][3];
    // per-band slen (LSF only; the all-ones value marks an invalid
    // intensity position, ISO 13818-3)
    int l_slen[22];
    int s_slen[13][3];
};

void read_scalefacs_v1(Bits& b, const Granule& g, const int scfsi[4],
                       const ScaleFacs* gr0, int gr_idx, ScaleFacs& sf) {
    std::memset(&sf, 0, sizeof(sf));
    int s1 = kSlen1[g.scalefac_compress], s2 = kSlen2[g.scalefac_compress];
    if (g.block_type == 2) {
        if (g.mixed) {
            for (int sfb = 0; sfb < 8; sfb++) sf.l[sfb] = b.get(s1);
            for (int sfb = 3; sfb < 6; sfb++)
                for (int w = 0; w < 3; w++) sf.s[sfb][w] = b.get(s1);
        } else {
            for (int sfb = 0; sfb < 6; sfb++)
                for (int w = 0; w < 3; w++) sf.s[sfb][w] = b.get(s1);
        }
        for (int sfb = 6; sfb < 12; sfb++)
            for (int w = 0; w < 3; w++) sf.s[sfb][w] = b.get(s2);
    } else {
        const int groups[4][3] = {{0, 6, s1}, {6, 11, s1}, {11, 16, s2},
                                  {16, 21, s2}};
        for (int band = 0; band < 4; band++) {
            int lo = groups[band][0], hi = groups[band][1], sl = groups[band][2];
            if (gr_idx == 1 && scfsi[band] && gr0) {
                for (int sfb = lo; sfb < hi; sfb++) sf.l[sfb] = gr0->l[sfb];
            } else {
                for (int sfb = lo; sfb < hi; sfb++) sf.l[sfb] = b.get(sl);
            }
        }
    }
}

// LSF scalefactors (ISO 13818-3). The right channel of an intensity-stereo
// frame uses sc>>1 with the intensity decompositions; per-value slen is
// kept so the stereo stage can detect invalid (all-ones) positions.
void read_scalefacs_lsf(Bits& b, Granule& g, ScaleFacs& sf, bool intensity) {
    std::memset(&sf, 0, sizeof(sf));
    int sc = g.scalefac_compress;
    int shape = g.block_type != 2 ? 0 : (g.mixed ? 2 : 1);
    int slen[4], nr[4];
    static const int nr_a[3][4] = {{6, 5, 5, 5}, {9, 9, 9, 9}, {6, 9, 9, 9}};
    static const int nr_b[3][4] = {{6, 5, 7, 3}, {9, 9, 12, 6}, {6, 9, 12, 6}};
    static const int nr_c[3][4] = {{11, 10, 0, 0}, {18, 18, 0, 0},
                                   {15, 18, 0, 0}};
    static const int nr_ia[3][4] = {{7, 7, 7, 0}, {12, 12, 12, 0},
                                    {6, 15, 12, 0}};
    static const int nr_ib[3][4] = {{6, 6, 6, 3}, {12, 9, 9, 6},
                                    {6, 12, 9, 6}};
    static const int nr_ic[3][4] = {{8, 8, 5, 0}, {15, 12, 9, 0},
                                    {6, 18, 9, 0}};
    if (intensity) {
        int isc = sc >> 1;
        if (isc < 180) {
            slen[0] = isc / 36; slen[1] = (isc % 36) / 6;
            slen[2] = isc % 6; slen[3] = 0;
            std::memcpy(nr, nr_ia[shape], sizeof(nr));
        } else if (isc < 244) {
            int c = isc - 180;
            slen[0] = (c % 64) >> 4; slen[1] = (c % 16) >> 2;
            slen[2] = c % 4; slen[3] = 0;
            std::memcpy(nr, nr_ib[shape], sizeof(nr));
        } else {
            int c = isc - 244;
            slen[0] = c / 3; slen[1] = c % 3; slen[2] = slen[3] = 0;
            std::memcpy(nr, nr_ic[shape], sizeof(nr));
        }
    } else if (sc < 400) {
        slen[0] = (sc >> 4) / 5; slen[1] = (sc >> 4) % 5;
        slen[2] = (sc % 16) >> 2; slen[3] = sc % 4;
        std::memcpy(nr, nr_a[shape], sizeof(nr));
    } else if (sc < 500) {
        int c = sc - 400;
        slen[0] = (c >> 2) / 5; slen[1] = (c >> 2) % 5;
        slen[2] = c % 4; slen[3] = 0;
        std::memcpy(nr, nr_b[shape], sizeof(nr));
    } else {
        int c = sc - 500;
        slen[0] = c / 3; slen[1] = c % 3; slen[2] = slen[3] = 0;
        std::memcpy(nr, nr_c[shape], sizeof(nr));
        g.preflag = 1;
    }
    int flat[54], fsl[54], k = 0;
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < nr[i]; j++) {
            flat[k] = slen[i] ? (int)b.get(slen[i]) : 0;
            fsl[k++] = slen[i];
        }
    if (g.block_type == 2) {
        int p = 0;
        if (g.mixed) {
            for (int sfb = 0; sfb < 6; sfb++, p++) {
                sf.l[sfb] = flat[p];
                sf.l_slen[sfb] = fsl[p];
            }
            for (int sfb = 3; sfb < 12; sfb++)
                for (int w = 0; w < 3; w++, p++) {
                    sf.s[sfb][w] = flat[p];
                    sf.s_slen[sfb][w] = fsl[p];
                }
        } else {
            for (int sfb = 0; sfb < 12; sfb++)
                for (int w = 0; w < 3; w++, p++) {
                    sf.s[sfb][w] = flat[p];
                    sf.s_slen[sfb][w] = fsl[p];
                }
        }
    } else {
        for (int sfb = 0; sfb < 21; sfb++) {
            sf.l[sfb] = flat[sfb];
            sf.l_slen[sfb] = fsl[sfb];
        }
    }
}

// --------------------------------------------------------- spectrum decode

bool huffman_spectrum(Bits& b, const Granule& g, const int16_t* sfb_long,
                      const int16_t* sfb_short, int64_t part2_start,
                      int32_t* xs) {
    const Tables& T = tables();
    std::memset(xs, 0, 576 * sizeof(int32_t));
    int region1, region2;
    if (g.wsf) {
        region1 = (g.block_type == 2 && !g.mixed) ? 3 * sfb_short[3]
                                                  : sfb_long[8];
        region2 = 576;
    } else {
        region1 = sfb_long[g.region0_count + 1];
        int r2 = g.region0_count + g.region1_count + 2;
        region2 = sfb_long[r2 > 22 ? 22 : r2];
    }
    int i = 0;
    for (int bv = 0; bv < g.big_values && i < 576; bv++, i += 2) {
        int sel = g.table_select[i < region1 ? 0 : (i < region2 ? 1 : 2)];
        const BigValueTable& t = T.bv[sel];
        if (!t.huff) continue;
        int idx = b.huff(*t.huff);
        if (idx < 0) return false;
        int x = idx / t.xlen, y = idx % t.xlen;
        if (x == 15 && t.linbits) x += b.get(t.linbits);
        if (x && b.get1()) x = -x;
        if (y == 15 && t.linbits) y += b.get(t.linbits);
        if (y && b.get1()) y = -y;
        xs[i] = x;
        xs[i + 1] = y;
    }
    int64_t limit = part2_start + g.part2_3_length;
    while (b.pos < limit && i <= 572) {
        int quad;
        if (g.count1table_select) {
            quad = 15 - (int)b.get(4);
        } else {
            quad = b.huff(T.h[15]);
            if (quad < 0) return false;
        }
        for (int j = 0; j < 4; j++) {
            int v = (quad >> (3 - j)) & 1;
            if (v && b.get1()) v = -1;
            xs[i + j] = v;
        }
        i += 4;
    }
    if (b.pos > limit && i >= 4) {
        i -= 4;
        xs[i] = xs[i + 1] = xs[i + 2] = xs[i + 3] = 0;
    }
    b.pos = limit;
    return true;
}

double pow43(int32_t v) {
    const Tables& T = tables();
    int a = v < 0 ? -v : v;
    double m = a < 8207 ? T.pow43[a] : std::pow((double)a, 4.0 / 3.0);
    return v < 0 ? -m : m;
}

// Mixed blocks: the long region spans 8 long sfbs in MPEG-1 but only 6 in
// LSF streams (the LSF scalefactor partitions provide 6 long values).
int mixed_long_sfbs(bool lsf) { return lsf ? 6 : 8; }

void requantize(const int32_t* xs, const Granule& g, const ScaleFacs& sf,
                const int16_t* sfb_long, const int16_t* sfb_short,
                bool lsf, double* xr) {
    double sf_mult = g.scalefac_scale ? 1.0 : 0.5;
    int gg = g.global_gain - 210;
    if (g.block_type == 2) {
        int long_sfbs = g.mixed ? mixed_long_sfbs(lsf) : 0;
        int n_long = g.mixed ? sfb_long[long_sfbs] : 0;
        int first_short = g.mixed ? 3 : 0;
        for (int sfb = 0; sfb < long_sfbs; sfb++) {
            double e = gg / 4.0 -
                sf_mult * (sf.l[sfb] + g.preflag * k_pretab[sfb]);
            double m = std::pow(2.0, e);
            for (int i = sfb_long[sfb]; i < sfb_long[sfb + 1]; i++)
                xr[i] = pow43(xs[i]) * m;
        }
        for (int sfb = first_short; sfb < 13; sfb++) {
            int lo = sfb_short[sfb], n = sfb_short[sfb + 1] - lo;
            for (int w = 0; w < 3; w++) {
                double e = (gg - 8 * g.subblock_gain[w]) / 4.0 -
                           sf_mult * (sfb < 12 ? sf.s[sfb][w] : 0);
                double m = std::pow(2.0, e);
                int s = g.mixed ? n_long + 3 * (lo - sfb_short[first_short]) +
                                      w * n
                                : 3 * lo + w * n;
                for (int i = 0; i < n && s + i < 576; i++)
                    xr[s + i] = pow43(xs[s + i]) * m;
            }
        }
    } else {
        for (int sfb = 0; sfb < 22; sfb++) {
            double e = gg / 4.0 -
                sf_mult * (sf.l[sfb] + g.preflag * k_pretab[sfb]);
            double m = std::pow(2.0, e);
            for (int i = sfb_long[sfb]; i < sfb_long[sfb + 1]; i++)
                xr[i] = pow43(xs[i]) * m;
        }
    }
}

// Per-line intensity position (7 = not intensity-coded), MPEG-1: intensity
// applies to scalefactor bands above the right channel's zero boundary
// (per window for short blocks, ISO 11172-3 2.4.3.4.9.3). Operates on the
// PRE-reorder spectrum: short band sfb, window w is [3*lo+w*n, 3*lo+(w+1)*n).
void intensity_positions(const double* xr_r, const Granule& g,
                         const ScaleFacs& sf, const int16_t* sfb_long,
                         const int16_t* sfb_short, bool lsf, int* pos,
                         int* sl) {
    for (int i = 0; i < 576; i++) { pos[i] = -1; sl[i] = 0; }
    auto any_nonzero = [&](int base, int n) {
        for (int i = 0; i < n; i++)
            if (xr_r[base + i] != 0.0) return true;
        return false;
    };
    if (g.block_type == 2) {
        int start_sfb = g.mixed ? 3 : 0;
        int base_off = g.mixed ? sfb_long[mixed_long_sfbs(lsf)] : 0;
        auto short_base = [&](int sfb, int w) {
            int lo = sfb_short[sfb], n = sfb_short[sfb + 1] - lo;
            return g.mixed
                ? base_off + 3 * (lo - sfb_short[start_sfb]) + w * n
                : 3 * lo + w * n;
        };
        for (int w = 0; w < 3; w++) {
            int sfbcnt = start_sfb - 1;
            for (int sfb = 12; sfb >= start_sfb; sfb--) {
                int n = sfb_short[sfb + 1] - sfb_short[sfb];
                if (any_nonzero(short_base(sfb, w), n)) { sfbcnt = sfb; break; }
            }
            for (int sfb = sfbcnt + 1; sfb < 13; sfb++) {
                int n = sfb_short[sfb + 1] - sfb_short[sfb];
                int q = sfb < 12 ? sfb : 11;
                int base = short_base(sfb, w);
                for (int i = 0; i < n && base + i < 576; i++) {
                    pos[base + i] = sf.s[q][w];
                    sl[base + i] = sf.s_slen[q][w];
                }
            }
        }
    } else {
        int sfbcnt = -1;
        for (int sfb = 21; sfb >= 0; sfb--) {
            if (any_nonzero(sfb_long[sfb], sfb_long[sfb + 1] - sfb_long[sfb])) {
                sfbcnt = sfb;
                break;
            }
        }
        for (int sfb = sfbcnt + 1; sfb < 22; sfb++) {
            int q = sfb < 21 ? sfb : 20;
            for (int i = sfb_long[sfb]; i < sfb_long[sfb + 1]; i++) {
                pos[i] = sf.l[q];
                sl[i] = sf.l_slen[q];
            }
        }
    }
}

// Joint-stereo reconstruction in place: intensity (MPEG-1 + LSF) and MS.
void stereo_process(double* xl, double* xrr, const Granule& g_r,
                    const ScaleFacs& sf_r, int mode_ext,
                    const int16_t* sfb_long, const int16_t* sfb_short,
                    bool lsf) {
    const double inv_sqrt2 = 0.7071067811865476;
    bool ms = (mode_ext & 2) != 0;
    if (!(mode_ext & 1)) {
        if (ms)
            for (int i = 0; i < 576; i++) {
                double m = xl[i], s = xrr[i];
                xl[i] = (m + s) * inv_sqrt2;
                xrr[i] = (m - s) * inv_sqrt2;
            }
        return;
    }
    int pos[576], sl[576];
    intensity_positions(xrr, g_r, sf_r, sfb_long, sfb_short, lsf, pos, sl);
    const double pi = 3.14159265358979323846;
    // LSF: invalid when all slen bits set; io from sc's LSB (13818-3)
    const double io = std::pow(2.0,
                               -0.25 * ((g_r.scalefac_compress & 1) + 1));
    for (int i = 0; i < 576; i++) {
        bool in_region = pos[i] >= 0;
        bool valid = in_region &&
            (lsf ? !(sl[i] > 0 && pos[i] == (1 << sl[i]) - 1) : pos[i] != 7);
        if (valid) {
            double l = xl[i], k0, k1;
            if (lsf) {
                if (pos[i] & 1) {
                    k0 = std::pow(io, (pos[i] + 1) / 2);
                    k1 = 1.0;
                } else {
                    k0 = 1.0;
                    k1 = std::pow(io, pos[i] / 2);
                }
            } else {
                double ratio = std::tan(pos[i] * (pi / 12.0));
                k0 = ratio / (1.0 + ratio);
                k1 = 1.0 / (1.0 + ratio);
            }
            xl[i] = l * k0;
            xrr[i] = l * k1;
        } else if (ms) {
            double m = xl[i], s = xrr[i];
            xl[i] = (m + s) * inv_sqrt2;
            xrr[i] = (m - s) * inv_sqrt2;
        }
    }
}

void reorder_short(double* xr, const Granule& g, const int16_t* sfb_short,
                   const int16_t* sfb_long, bool lsf) {
    if (g.block_type != 2) return;
    double tmp[576];
    std::memcpy(tmp, xr, sizeof(tmp));
    int start_sfb = g.mixed ? 3 : 0;
    int src = g.mixed ? sfb_long[mixed_long_sfbs(lsf)] : 0;
    for (int sfb = start_sfb; sfb < 13; sfb++) {
        int lo = sfb_short[sfb], n = sfb_short[sfb + 1] - lo;
        if (src + 3 * n > 576) break;
        for (int w = 0; w < 3; w++)
            for (int i = 0; i < n; i++)
                xr[3 * lo + 3 * i + w] = tmp[src + w * n + i];
        src += 3 * n;
    }
}

void alias_reduce(double* xr, const Granule& g) {
    const Tables& T = tables();
    int n_bounds = g.block_type != 2 ? 31 : (g.mixed ? 1 : 0);
    for (int sb = 1; sb <= n_bounds; sb++) {
        int base = 18 * sb;
        for (int i = 0; i < 8; i++) {
            double a = xr[base - 1 - i], c = xr[base + i];
            xr[base - 1 - i] = a * T.cs[i] - c * T.ca[i];
            xr[base + i] = c * T.cs[i] + a * T.ca[i];
        }
    }
}

// --------------------------------------------------- IMDCT + synthesis

// Fast matrixing: the polyphase needs v[i] = F(s, 32, 16+i), i in [0,64),
//   F(s, N, m) = sum_{k<N} s[k] * cos(m * (2k+1) * pi / (2N)).
// F is 4N-periodic in m with F(64-m) = -F(m) and F(m) = -F(m-64), so the
// 64 values fold onto F(m), m in [0,32] (and F(32) = 0): compute ONLY the
// 32 base outputs with Lee's recursive DCT-II split (~80 multiplies, no
// full-period shuffle), then fan out by exact IEEE negation:
//   X[2r]   = A[r],                 a[k] = s[k] + s[N-1-k]
//   X[2r+1] = U[r] + U[r+1],        u[k] = (s[k] - s[N-1-k])
//   X[N-1]  = U[N/2-1]                     / (2 cos((2k+1)pi/(2N)))
// Templated on N so the depth-5 recursion fully inlines.
template <int N>
struct Dct2 {
    static inline void run(const double* s, double* X /* N */) {
        constexpr int H = N / 2;
        double a[H], u[H], A[H], U[H];
        for (int k = 0; k < H; k++) {
            a[k] = s[k] + s[N - 1 - k];
            u[k] = (s[k] - s[N - 1 - k]) * half_sec(k);
        }
        Dct2<H>::run(a, A);
        Dct2<H>::run(u, U);
        for (int r = 0; r < H; r++) X[2 * r] = A[r];
        for (int r = 0; r + 1 < H; r++) X[2 * r + 1] = U[r] + U[r + 1];
        X[N - 1] = U[H - 1];
    }
    static inline double half_sec(int k) {
        static const struct Tab {
            double v[N / 2];
            Tab() {
                for (int k = 0; k < N / 2; k++)
                    v[k] = 0.5 / std::cos((2 * k + 1) * 3.14159265358979323846
                                          / (2.0 * N));
            }
        } tab;
        return tab.v[k];
    }
};

template <>
struct Dct2<1> {
    static inline void run(const double* s, double* X) { X[0] = s[0]; }
};

struct ChannelState {
    double overlap[32][18] = {};
    // V ring buffer: logical v[j] == v[(v_pos + j) & 1023]. The classic
    // shift-by-64 becomes a 64-slot rewind of v_pos — the 960-double
    // memmove per time slot (17 KB x 18 per granule) goes away. All slice
    // starts stay multiples of 32 and 1024 % 32 == 0, so no 32-double
    // chunk ever wraps the ring.
    double v[1024] = {};
    int v_pos = 0;

    // xr (576,) -> 18 time slots x 32 subbands, then polyphase synthesis.
    // Hot loops are laid out for the autovectorizer: the subband samples
    // are stored time-major (ts_t[t][sb] contiguous over sb) so the
    // 64x32 matrixing reads unit-stride, and the window MAC accumulates
    // 32 outputs in parallel over contiguous rows.
    void granule_to_pcm(const double* xr, const Granule& g, float* out) {
        const Tables& T = tables();
        double ts_t[18][32];
        for (int sb = 0; sb < 32; sb++) {
            const double* spec = xr + 18 * sb;
            bool zero = true;
            for (int k = 0; k < 18; k++)
                if (spec[k] != 0.0) { zero = false; break; }
            if (zero) {
                // IMDCT of an all-zero subband is zero: emit the pending
                // overlap and clear it. At typical AudioSet bitrates most
                // upper subbands take this path (rzero region).
                const bool flip = sb & 1;
                for (int i = 0; i < 18; i++) {
                    double s = overlap[sb][i];
                    overlap[sb][i] = 0.0;
                    ts_t[i][sb] = (flip && (i & 1)) ? -s : s;
                }
                continue;
            }
            int bt = g.block_type;
            if (bt == 2 && g.mixed && sb < 2) bt = 0;
            // IMDCT outputs have the standard phase symmetries (verified
            // to 1e-14): raw[i] = -raw[17-i] for i<9 (first half
            // antisymmetric) and raw[i] = raw[53-i] for i>=27 (second
            // half symmetric); 12-point: raw[i] = -raw[5-i] for i<3,
            // raw[i] = raw[17-i] for i>=9. Only the middle rows are
            // computed — HALF the IMDCT multiplies.
            double blk[36];
            if (bt == 2) {
                std::memset(blk, 0, sizeof(blk));
                for (int w = 0; w < 3; w++) {
                    double a12[6];
                    for (int r = 0; r < 6; r++) {
                        double acc = 0.0;
                        for (int k = 0; k < 6; k++)
                            acc += T.imdct12[3 + r][k] * spec[w + 3 * k];
                        a12[r] = acc;
                    }
                    double* o = blk + 6 + 6 * w;
                    for (int i = 0; i < 3; i++)
                        o[i] += -a12[2 - i] * T.win12[i];
                    for (int i = 3; i < 9; i++)
                        o[i] += a12[i - 3] * T.win12[i];
                    for (int i = 9; i < 12; i++)
                        o[i] += a12[14 - i] * T.win12[i];
                }
            } else {
                double mid[18];  // raw rows 9..26
                for (int r = 0; r < 18; r++) {
                    double acc = 0.0;
                    const double* row = T.imdct36[9 + r];
                    for (int k = 0; k < 18; k++)
                        acc += row[k] * spec[k];
                    mid[r] = acc;
                }
                for (int i = 0; i < 9; i++)
                    blk[i] = -mid[8 - i] * T.win[bt][i];
                for (int i = 9; i < 27; i++)
                    blk[i] = mid[i - 9] * T.win[bt][i];
                for (int i = 27; i < 36; i++)
                    blk[i] = mid[44 - i] * T.win[bt][i];
            }
            const bool flip = sb & 1;
            for (int i = 0; i < 18; i++) {
                double s = blk[i] + overlap[sb][i];
                overlap[sb][i] = blk[18 + i];
                ts_t[i][sb] = (flip && (i & 1)) ? -s : s;
            }
        }
        for (int t = 0; t < 18; t++) {
            v_pos = (v_pos + 1024 - 64) & 1023;
            double* slot = v + v_pos;  // [v_pos, v_pos+64) never wraps
            const double* s = ts_t[t];
            double X[32];  // F(s, 32, m), m in [0,32)
            Dct2<32>::run(s, X);
            // v[i] = F(s, 32, 16+i) via the fold (F(32)=0 at i=16)
            for (int i = 0; i < 16; i++) slot[i] = X[16 + i];
            slot[16] = 0.0;
            for (int i = 17; i < 48; i++) slot[i] = -X[48 - i];
            for (int i = 48; i < 64; i++) slot[i] = -X[i - 48];
            // window MAC straight off the ring (each 32-double chunk is
            // wrap-free, see the v[] invariant above) — no staging copy
            double acc[32] = {};
            for (int j = 0; j < 8; j++) {
                const double* u0 = v + ((v_pos + j * 128) & 1023);
                const double* u1 = v + ((v_pos + j * 128 + 96) & 1023);
                const double* w0 = T.dwin + 64 * j;
                const double* w1 = w0 + 32;
                for (int i = 0; i < 32; i++) acc[i] += u0[i] * w0[i];
                for (int i = 0; i < 32; i++) acc[i] += u1[i] * w1[i];
            }
            for (int j = 0; j < 32; j++) out[t * 32 + j] = (float)acc[j];
        }
    }
};

}  // namespace

extern "C" {

int eat_mp3_decode(const uint8_t* data, int64_t n_bytes, float** out,
                   int64_t* n_samples, int* sr_out, int* channels_out) {
    const Tables& T = tables();
    (void)T;
    int64_t pos = 0;
    FrameInfo fi;
    if (!find_frame(data, n_bytes, pos, fi)) return 1;
    const int sr = fi.sr;
    const int nch = fi.mode == 3 ? 1 : 2;
    // sfb tables, rate order in mp3_tables.h:
    // 44100,48000,32000,22050,24000,16000,11025,12000,8000
    int row = fi.sr_idx;          // within version group
    if (fi.lsf) row += fi.mpeg25 ? 6 : 3;
    const int16_t* sfb_long = k_sfb_long + 23 * row;
    const int16_t* sfb_short = k_sfb_short + 14 * row;

    std::vector<ChannelState> state(nch);
    std::vector<std::vector<float>> pcm(nch);
    // ~1152 samples per frame of frame_len bytes; presize to skip regrows
    const int64_t flen_est = fi.frame_len > 0 ? fi.frame_len : 96;
    for (int ch = 0; ch < nch; ch++)
        pcm[ch].reserve((size_t)(n_bytes / flen_est + 2) * 1152);
    std::vector<uint8_t> reservoir;
    reservoir.reserve(4096);
    std::vector<uint8_t> md;  // reused across frames
    md.reserve(8192);

    int free_base = 0;  // free-format frame size (excl. padding), lazy
    while (true) {
        FrameInfo f2;
        int64_t fpos = pos;
        if (!find_frame(data, n_bytes, fpos, f2)) break;
        if (f2.sr != sr || (f2.mode == 3 ? 1 : 2) != nch) break;
        if (f2.frame_len == 0) {  // free format: measure to the next sync
            if (free_base == 0) {
                // skip false syncs inside the frame: the next header must be
                // a matching free-format header of the same stream
                int64_t p2 = fpos + 4;
                while (true) {
                    FrameInfo fn;
                    if (!find_frame(data, n_bytes, p2, fn)) { p2 = -1; break; }
                    if (fn.frame_len == 0 && fn.sr == f2.sr &&
                        fn.mode == f2.mode && fn.lsf == f2.lsf)
                        break;
                    p2++;
                }
                if (p2 < 0) break;
                free_base = (int)(p2 - fpos) - f2.padding;
            }
            f2.frame_len = free_base + f2.padding;
        }
        if (fpos + f2.frame_len > n_bytes) break;
        const uint8_t* frame = data + fpos;
        pos = fpos + f2.frame_len;

        int off = 4 + (f2.crc ? 2 : 0);
        int side_len = f2.lsf ? (nch == 1 ? 9 : 17) : (nch == 1 ? 17 : 32);
        if (off + side_len > f2.frame_len) continue;
        if (f2.crc) {
            // ISO CRC-16 (poly 0x8005, init 0xFFFF) over header bytes 2-3 +
            // side info; drop frames whose side info fails the check
            uint16_t crc = 0xFFFF;
            auto feed = [&](uint8_t byte) {
                for (int bit = 7; bit >= 0; bit--) {
                    int in = (byte >> bit) & 1;
                    int hi = (crc >> 15) & 1;
                    crc <<= 1;
                    if (hi ^ in) crc ^= 0x8005;
                }
            };
            feed(frame[2]);
            feed(frame[3]);
            for (int i = 0; i < side_len; i++) feed(frame[6 + i]);
            uint16_t want = ((uint16_t)frame[4] << 8) | frame[5];
            if (crc != want) continue;
        }
        Bits sb(frame + off, side_len);
        SideInfo si;
        read_side_info(sb, nch, f2.lsf, si);
        const uint8_t* main = frame + off + side_len;
        int main_len = f2.frame_len - off - side_len;

        bool decodable = si.main_data_begin <= (int)reservoir.size();
        if (decodable) {
            md.assign(reservoir.end() - si.main_data_begin, reservoir.end());
            md.insert(md.end(), main, main + main_len);
        }
        reservoir.insert(reservoir.end(), main, main + main_len);
        if (reservoir.size() > 4096)
            reservoir.erase(reservoir.begin(),
                            reservoir.end() - 4096);
        if (!decodable) continue;

        Bits b(md.data(), (int64_t)md.size());
        ScaleFacs gr0_sf[2];
        double xr[2][576];
        ScaleFacs sf_ch[2];
        for (int gr = 0; gr < si.ngr; gr++) {
            bool gr_ok = true;
            for (int ch = 0; ch < nch; ch++) {
                Granule& g = si.gr[gr][ch];
                int64_t part2_start = b.pos;
                ScaleFacs& sf = sf_ch[ch];
                if (f2.lsf) {
                    bool intensity = nch == 2 && f2.mode == 1 &&
                                     (f2.mode_ext & 1) && ch == 1;
                    read_scalefacs_lsf(b, g, sf, intensity);
                } else {
                    read_scalefacs_v1(b, g, si.scfsi[ch],
                                      gr == 1 ? &gr0_sf[ch] : nullptr, gr, sf);
                    if (gr == 0) gr0_sf[ch] = sf;
                }
                int32_t xs[576];
                if (!huffman_spectrum(b, g, sfb_long, sfb_short, part2_start,
                                      xs)) {
                    gr_ok = false;
                    std::memset(xr[ch], 0, sizeof(xr[ch]));
                    continue;
                }
                std::memset(xr[ch], 0, sizeof(xr[ch]));
                requantize(xs, g, sf, sfb_long, sfb_short, f2.lsf, xr[ch]);
            }
            if (nch == 2 && f2.mode == 1 && gr_ok)
                stereo_process(xr[0], xr[1], si.gr[gr][1], sf_ch[1],
                               f2.mode_ext, sfb_long, sfb_short, f2.lsf);
            for (int ch = 0; ch < nch; ch++) {
                const Granule& g = si.gr[gr][ch];
                reorder_short(xr[ch], g, sfb_short, sfb_long, f2.lsf);
                alias_reduce(xr[ch], g);
                float buf[576];
                state[ch].granule_to_pcm(xr[ch], g, buf);
                pcm[ch].insert(pcm[ch].end(), buf, buf + 576);
            }
        }
    }

    int64_t n = pcm[0].size();
    if (n == 0) return 3;  // sync found but nothing decodable: corrupt blob
    float* o = (float*)std::malloc(sizeof(float) * (size_t)(n * nch) + 1);
    if (!o) return 2;
    for (int ch = 0; ch < nch; ch++)
        if (n > 0)
            std::memcpy(o + ch * n, pcm[ch].data(), sizeof(float) * (size_t)n);
    *out = o;
    *n_samples = n;
    *sr_out = sr;
    *channels_out = nch;
    return 0;
}

}  // extern "C"
