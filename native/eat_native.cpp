// eat_native — native host runtime for the efficientat_tpu data layer.
//
// The reference leans on C libraries for its host pipeline (FFmpeg via PyAV
// for decode, libsndfile via librosa; SURVEY.md §2.1). This library is the
// TPU build's first-party equivalent:
//   - RIFF/WAV decode (PCM 8/16/24/32-bit and float32), channel mixdown
//   - polyphase windowed-sinc resampling (Kaiser window, scipy
//     resample_poly-compatible design)
//   - a threaded decode+resample prefetch pool feeding fixed-size float
//     buffers to Python over ctypes (GIL-free decode)
//
// C ABI only — bound from Python with ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <numeric>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ------------------------------------------------------------------ alloc

void eat_free(void* p) { free(p); }

// ------------------------------------------------------------------- WAV

// Reads a RIFF/WAVE file. Returns 0 on success. Caller frees *out with
// eat_free. Channels are interleaved in the file; *out is mono-mixed when
// mixdown != 0, otherwise channel 0.
int eat_read_wav(const char* path, int mixdown, float** out, int64_t* n_samples,
                 int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  auto fail = [&](int code) {
    fclose(f);
    return code;
  };

  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return fail(-2);
  if (fread(&riff_size, 4, 1, f) != 1) return fail(-2);
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return fail(-2);

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool have_fmt = false;
  std::vector<uint8_t> data;

  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4) break;
    if (fread(&size, 4, 1, f) != 1) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) return fail(-3);
      memcpy(&format, buf, 2);
      memcpy(&channels, buf + 2, 2);
      memcpy(&rate, buf + 4, 4);
      memcpy(&bits, buf + 14, 2);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      data.resize(size);
      if (fread(data.data(), 1, size, f) != size) return fail(-4);
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (have_fmt && !data.empty()) break;
  }
  fclose(f);
  if (!have_fmt || data.empty() || channels == 0) return -5;
  // format 1 = PCM int, 3 = IEEE float, 0xFFFE = extensible (assume PCM)
  if (format != 1 && format != 3 && format != 0xFFFE) return -6;

  const int bytes = bits / 8;
  const int64_t frames = (int64_t)data.size() / (bytes * channels);
  float* result = (float*)malloc(sizeof(float) * frames);
  if (!result) return -7;

  const int used_channels = mixdown ? channels : 1;
  const float inv_ch = 1.0f / (float)used_channels;
  for (int64_t i = 0; i < frames; i++) {
    float acc = 0.f;
    for (int c = 0; c < used_channels; c++) {
      const uint8_t* p = data.data() + (i * channels + c) * bytes;
      float v = 0.f;
      if (format == 3 && bits == 32) {
        float tmp;
        memcpy(&tmp, p, 4);
        v = tmp;
      } else if (bits == 16) {
        int16_t tmp;
        memcpy(&tmp, p, 2);
        v = (float)tmp / 32768.0f;
      } else if (bits == 32) {
        int32_t tmp;
        memcpy(&tmp, p, 4);
        v = (float)((double)tmp / 2147483648.0);
      } else if (bits == 24) {
        int32_t tmp = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (float)((double)tmp / 2147483648.0);
      } else if (bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      } else {
        free(result);
        return -6;
      }
      acc += v;
    }
    result[i] = acc * inv_ch;
  }
  *out = result;
  *n_samples = frames;
  *sample_rate = (int)rate;
  return 0;
}

// -------------------------------------------------------------- resample

static double bessel_i0(double x) {
  // series expansion, converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; k++) {
    term *= y / (double)(k * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// scipy.signal.resample_poly-compatible design: firwin(2*10*M+1, 1/M,
// window=('kaiser', 5.0)) where M = max(up, down), DC-normalized, gain up.
static std::vector<double> design_filter(int up, int down) {
  const int m = std::max(up, down);
  const int half = 10 * m;
  const int n = 2 * half + 1;
  const double fc = 1.0 / (double)m;  // in Nyquist units of upsampled rate
  const double beta = 5.0;
  std::vector<double> h(n);
  const double den0 = bessel_i0(beta);
  double dc = 0.0;
  for (int i = 0; i < n; i++) {
    const double x = (double)(i - half);
    const double sinc = (x == 0.0) ? fc : sin(M_PI * fc * x) / (M_PI * x);
    const double r = x / (double)half;
    const double w = bessel_i0(beta * sqrt(std::max(0.0, 1.0 - r * r))) / den0;
    h[i] = sinc * w;
    dc += h[i];
  }
  // firwin scales so the DC gain is 1; resample_poly then multiplies by up.
  for (auto& v : h) v = v / dc * (double)up;
  return h;
}

// Polyphase rational resample (up/down after gcd). Zero-padded edges like
// scipy.upfirdn. Caller frees *out with eat_free.
int eat_resample(const float* in, int64_t n_in, int sr_in, int sr_out,
                 float** out, int64_t* n_out) {
  if (sr_in == sr_out) {
    float* r = (float*)malloc(sizeof(float) * n_in);
    memcpy(r, in, sizeof(float) * n_in);
    *out = r;
    *n_out = n_in;
    return 0;
  }
  const int g = (int)std::gcd((long long)sr_in, (long long)sr_out);
  const int up = sr_out / g, down = sr_in / g;
  const std::vector<double> h = design_filter(up, down);
  const int64_t half = ((int64_t)h.size() - 1) / 2;
  const int64_t n_result = (n_in * up + down - 1) / down;  // ceil, scipy-compatible
  float* result = (float*)malloc(sizeof(float) * n_result);
  if (!result) return -1;

  // output j taps the upsampled grid at p = j*down + half (centered filter)
  for (int64_t j = 0; j < n_result; j++) {
    const int64_t p = j * (int64_t)down + half;
    // contributing inputs: indices i with up*i = p - k, 0 <= k < len(h)
    const int64_t i_max = std::min(p / up, n_in - 1);
    const int64_t i_min = std::max((int64_t)0, (p - (int64_t)h.size() + 1 + up - 1) / up);
    double acc = 0.0;
    for (int64_t i = i_min; i <= i_max; i++) {
      const int64_t k = p - (int64_t)up * i;
      acc += (double)in[i] * h[(size_t)k];
    }
    result[j] = (float)acc;
  }
  *out = result;
  *n_out = n_result;
  return 0;
}

// ----------------------------------------------------- format dispatch

// First-party mp3 decoder (eat_mp3.cpp).
int eat_mp3_decode(const uint8_t* data, int64_t n_bytes, float** out,
                   int64_t* n_samples, int* sr_out, int* channels_out);

// Decode a .wav or .mp3 file to mono float32. Caller frees with eat_free.
int eat_decode_file(const char* path, float** out, int64_t* n_samples,
                    int* sr) {
  size_t len = strlen(path);
  bool is_mp3 = len >= 4 && (strcmp(path + len - 4, ".mp3") == 0 ||
                             strcmp(path + len - 4, ".MP3") == 0);
  if (!is_mp3) return eat_read_wav(path, 1, out, n_samples, sr);
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)sz);
  if (sz > 0 && fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return 1;
  }
  fclose(f);
  float* pcm = nullptr;
  int64_t n = 0;
  int ch = 0;
  int rc = eat_mp3_decode(buf.data(), sz, &pcm, &n, sr, &ch);
  if (rc != 0) return rc;
  if (ch <= 1) {
    *out = pcm;
    *n_samples = n;
    return 0;
  }
  // mono mixdown of planar channels
  float* mono = (float*)malloc(sizeof(float) * (size_t)n + 1);
  if (!mono) {
    free(pcm);
    return 2;
  }
  for (int64_t i = 0; i < n; i++) {
    double acc = 0.0;
    for (int c = 0; c < ch; c++) acc += pcm[(int64_t)c * n + i];
    mono[i] = (float)(acc / ch);
  }
  free(pcm);
  *out = mono;
  *n_samples = n;
  return 0;
}

// --------------------------------------------------------- prefetch pool

struct Job {
  int64_t id;
  std::string path;
  int target_sr;
  int64_t clip_samples;  // pad/truncate to this many samples; -1 = keep
};

struct Result {
  int64_t id;
  int status;
  std::vector<float> wave;
};

struct Pool {
  std::vector<std::thread> workers;
  std::queue<Job> jobs;
  std::queue<Result> results;
  std::mutex mu;
  std::condition_variable cv_job, cv_res;
  std::atomic<bool> stop{false};

  void worker() {
    while (true) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop();
      }
      Result res;
      res.id = job.id;
      float* raw = nullptr;
      int64_t n = 0;
      int sr = 0;
      res.status = eat_decode_file(job.path.c_str(), &raw, &n, &sr);
      if (res.status == 0) {
        float* rs = raw;
        int64_t n_rs = n;
        if (sr != job.target_sr) {
          float* tmp = nullptr;
          res.status = eat_resample(raw, n, sr, job.target_sr, &tmp, &n_rs);
          free(raw);
          rs = tmp;
        }
        if (res.status == 0) {
          int64_t n_final = job.clip_samples >= 0 ? job.clip_samples : n_rs;
          res.wave.assign((size_t)n_final, 0.f);
          memcpy(res.wave.data(), rs,
                 sizeof(float) * (size_t)std::min(n_rs, n_final));
          free(rs);
        }
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        results.push(std::move(res));
      }
      cv_res.notify_one();
    }
  }
};

void* eat_pool_create(int n_threads) {
  Pool* p = new Pool();
  for (int i = 0; i < n_threads; i++)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

void eat_pool_submit(void* pool, int64_t id, const char* path, int target_sr,
                     int64_t clip_samples) {
  Pool* p = (Pool*)pool;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push(Job{id, std::string(path), target_sr, clip_samples});
  }
  p->cv_job.notify_one();
}

// Blocks until a result is ready; copies up to buf_len floats into buf.
// Returns the job id; *status 0 = ok; *n_samples = floats written.
int64_t eat_pool_next(void* pool, float* buf, int64_t buf_len, int* status,
                      int64_t* n_samples) {
  Pool* p = (Pool*)pool;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_res.wait(lk, [&] { return !p->results.empty(); });
  Result res = std::move(p->results.front());
  p->results.pop();
  lk.unlock();
  *status = res.status;
  const int64_t n = std::min((int64_t)res.wave.size(), buf_len);
  if (res.status == 0) memcpy(buf, res.wave.data(), sizeof(float) * (size_t)n);
  *n_samples = n;
  return res.id;
}

void eat_pool_destroy(void* pool) {
  Pool* p = (Pool*)pool;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_job.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
