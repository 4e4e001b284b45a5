// Fuzz harness for eat_mp3_decode: random garbage, truncated streams, and
// bit-flipped valid streams must never crash or leak (build with
// -fsanitize=address,undefined; driven by tests/test_mp3.py).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int eat_mp3_decode(const uint8_t*, int64_t, float**, int64_t*,
                              int*, int*);
static void eat_free(void* p) { free(p); }


static uint64_t rng_state = 0x9e3779b97f4a7c15ull;
static uint64_t rnd() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return rng_state;
}

static void run_case(const std::vector<uint8_t>& buf) {
    float* out = nullptr;
    int64_t n = 0;
    int sr = 0, ch = 0;
    int rc = eat_mp3_decode(buf.data(), (int64_t)buf.size(), &out, &n, &sr, &ch);
    if (rc == 0 && out) eat_free(out);
}

int main(int argc, char** argv) {
    int iters = argc > 1 ? atoi(argv[1]) : 300;
    // optional seed stream (a valid mp3) to mutate
    std::vector<uint8_t> seed;
    if (argc > 2) {
        FILE* f = fopen(argv[2], "rb");
        if (f) {
            fseek(f, 0, SEEK_END);
            long sz = ftell(f);
            fseek(f, 0, SEEK_SET);
            seed.resize(sz);
            if (fread(seed.data(), 1, sz, f) != (size_t)sz) seed.clear();
            fclose(f);
        }
    }
    for (int it = 0; it < iters; it++) {
        std::vector<uint8_t> buf;
        int mode = it % 3;
        if (mode == 0 || seed.empty()) {           // pure garbage w/ sync bytes
            buf.resize(64 + rnd() % 8192);
            for (auto& b : buf) b = (uint8_t)rnd();
            for (size_t i = 0; i + 1 < buf.size(); i += 97) {
                buf[i] = 0xFF;
                buf[i + 1] = 0xE0 | (uint8_t)(rnd() & 0x1F);
            }
        } else if (mode == 1) {                     // truncated valid stream
            size_t cut = 1 + rnd() % seed.size();
            buf.assign(seed.begin(), seed.begin() + cut);
        } else {                                    // bit-flipped valid stream
            buf = seed;
            int flips = 1 + rnd() % 64;
            for (int k = 0; k < flips; k++)
                buf[rnd() % buf.size()] ^= (uint8_t)(1u << (rnd() & 7));
        }
        run_case(buf);
    }
    printf("fuzz ok (%d cases)\n", iters);
    return 0;
}
