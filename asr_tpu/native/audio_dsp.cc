// Native audio ingest DSP for asr_tpu (C++17, no external deps).
//
// The reference delegates audio ingest to pydub/ffmpeg + numpy on the host
// (SenseVoice/Inference_SenseVoice_ONNX.py:62-86). For production serving the
// hot host-side path is sample-rate conversion of many concurrent streams;
// this library provides a windowed-sinc polyphase resampler, channel
// downmix, PCM conversion and RMS utilities callable via ctypes
// (asr_tpu/native/__init__.py). Python/scipy remains the fallback.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Modified Bessel function of the first kind, order 0 (for Kaiser window).
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double half_x = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

}  // namespace

extern "C" {

// Design a Kaiser-windowed sinc low-pass FIR: cutoff in (0, 1] relative to
// Nyquist, `taps` odd length, `beta` Kaiser parameter. Gain `scale` applied.
void design_lowpass(double cutoff, double beta, double scale, long taps,
                    float* out) {
  const long half = (taps - 1) / 2;
  const double denom = bessel_i0(beta);
  for (long n = 0; n < taps; ++n) {
    const double m = static_cast<double>(n - half);
    const double sinc =
        (m == 0.0) ? cutoff : std::sin(M_PI * cutoff * m) / (M_PI * m);
    const double r = 2.0 * m / (taps - 1);
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    out[n] = static_cast<float>(scale * sinc * w);
  }
}

// Polyphase rational resampling by up/down with the given FIR (odd length,
// centered). Matches scipy.signal.resample_poly's output length
// ceil(n_in * up / down) and group-delay compensation.
void resample_poly(const float* in, long n_in, int up, int down,
                   const float* filt, long n_filt, float* out, long n_out) {
  const long half = (n_filt - 1) / 2;
  for (long m = 0; m < n_out; ++m) {
    // Output sample m sits at upsampled index m * down; the filter is
    // centered there (group delay `half` in upsampled domain).
    const long center = m * static_cast<long>(down);
    double acc = 0.0;
    // Upsampled index u = center - half + j has a nonzero input only when
    // u % up == 0 -> input index u / up.
    const long u0 = center - half;
    // First j with (u0 + j) % up == 0:
    long rem = ((u0 % up) + up) % up;
    long j = (rem == 0) ? 0 : (up - rem);
    for (; j < n_filt; j += up) {
      const long u = u0 + j;
      const long i = u / up;
      if (i >= 0 && i < n_in) {
        acc += static_cast<double>(filt[j]) * in[i];
      }
    }
    out[m] = static_cast<float>(acc);
  }
}

// Average `channels`-interleaved frames into mono.
void downmix_interleaved(const float* in, long frames, int channels,
                         float* out) {
  for (long t = 0; t < frames; ++t) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += in[t * channels + c];
    out[t] = static_cast<float>(acc / channels);
  }
}

// int16 PCM -> float32 (keeps int16 numeric range, the Kaldi convention).
void pcm16_to_float(const int16_t* in, long n, float* out) {
  for (long i = 0; i < n; ++i) out[i] = static_cast<float>(in[i]);
}

double rms(const float* x, long n) {
  double acc = 0.0;
  for (long i = 0; i < n; ++i) acc += static_cast<double>(x[i]) * x[i];
  return n > 0 ? std::sqrt(acc / n) : 0.0;
}

void scale_inplace(float* x, long n, float s) {
  for (long i = 0; i < n; ++i) x[i] *= s;
}

}  // extern "C"

// ── Multithreaded WAV batch loader ─────────────────────────────────────────
// Production data-loader: decode + downmix + resample a batch of WAV files
// in parallel worker threads and write fixed-size zero-padded windows —
// the host-side feeder for fixed-shape device batches (MicroBatcher /
// DataParallelRunner). RIFF-PCM16 and RIFF-float32 supported; everything
// else routes through the Python ingest path.

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> mono;  // downmixed, int16 numeric range
  int rate = 0;
  bool ok = false;
};

WavData read_wav_mono(const char* path) {
  WavData out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) != 0 ||
      std::memcmp(hdr + 8, "WAVE", 4) != 0) {
    std::fclose(f);
    return out;
  }
  int fmt = 0, channels = 0, rate = 0, bits = 0;
  std::vector<unsigned char> data;
  unsigned char chdr[8];
  while (std::fread(chdr, 1, 8, f) == 8) {
    const unsigned long size = chdr[4] | (chdr[5] << 8) | (chdr[6] << 16) |
                               (static_cast<unsigned long>(chdr[7]) << 24);
    if (std::memcmp(chdr, "fmt ", 4) == 0) {
      // Untrusted header: a PCM fmt chunk is >= 16 bytes; anything smaller
      // would make the b[14]/b[15] reads below out-of-bounds. Bound the
      // declared size by the bytes remaining in the file too — a hostile
      // 32-bit size field would otherwise zero-initialize up to 4 GiB
      // (and bad_alloc across the ctypes boundary aborts the process).
      if (size < 16) break;
      const long fpos = std::ftell(f);
      if (fpos < 0 || std::fseek(f, 0, SEEK_END) != 0) break;
      const long fend = std::ftell(f);
      if (fend < fpos || std::fseek(f, fpos, SEEK_SET) != 0) break;
      if (size > static_cast<unsigned long>(fend - fpos)) break;
      std::vector<unsigned char> b(size);
      if (std::fread(b.data(), 1, size, f) != size) break;
      fmt = b[0] | (b[1] << 8);
      channels = b[2] | (b[3] << 8);
      rate = b[4] | (b[5] << 8) | (b[6] << 16) | (b[7] << 24);
      bits = b[14] | (b[15] << 8);
    } else if (std::memcmp(chdr, "data", 4) == 0) {
      // Bound the declared size by the bytes actually remaining in the file
      // before allocating (a hostile 32-bit size field can claim 4 GiB).
      const long pos = std::ftell(f);
      if (pos < 0 || std::fseek(f, 0, SEEK_END) != 0) break;
      const long end = std::ftell(f);
      if (end < pos || std::fseek(f, pos, SEEK_SET) != 0) break;
      const unsigned long avail = static_cast<unsigned long>(end - pos);
      const unsigned long want = size < avail ? size : avail;
      data.resize(want);
      if (std::fread(data.data(), 1, want, f) != want) data.clear();
      break;
    } else {
      std::fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR);
    }
  }
  std::fclose(f);
  if (data.empty() || channels <= 0 || rate <= 0) return out;

  long frames = 0;
  std::vector<float> inter;
  if (fmt == 1 && bits == 16) {  // PCM16 -> int16 numeric range
    frames = static_cast<long>(data.size()) / (2 * channels);
    inter.resize(static_cast<size_t>(frames) * channels);
    const int16_t* s = reinterpret_cast<const int16_t*>(data.data());
    for (long i = 0; i < frames * channels; ++i) inter[i] = static_cast<float>(s[i]);
  } else if (fmt == 3 && bits == 32) {  // IEEE float [-1,1] -> int16 range
    frames = static_cast<long>(data.size()) / (4 * channels);
    inter.resize(static_cast<size_t>(frames) * channels);
    const float* s = reinterpret_cast<const float*>(data.data());
    for (long i = 0; i < frames * channels; ++i) inter[i] = s[i] * 32768.0f;
  } else {
    return out;
  }
  out.mono.resize(frames);
  for (long t = 0; t < frames; ++t) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += inter[static_cast<size_t>(t) * channels + c];
    out.mono[t] = static_cast<float>(acc / channels);
  }
  out.rate = rate;
  out.ok = true;
  return out;
}

long gcd_long(long a, long b) { return b == 0 ? a : gcd_long(b, a % b); }

}  // namespace

extern "C" {

// paths: n C strings. out: (n, window) float32 (zero-padded, truncated at
// window). valid[i]: TRUE resampled sample count (may exceed window — the
// caller decides how to handle overflow) or -1 on decode failure.
// Returns #succeeded.
int load_wav_batch(const char** paths, int n, int target_rate, long window,
                   float* out, long* valid, int n_threads) {
  std::atomic<int> next(0), succeeded(0);
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = 4;
  if (n_threads > n) n_threads = n;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + static_cast<size_t>(i) * window;
      std::memset(row, 0, sizeof(float) * window);
      WavData w = read_wav_mono(paths[i]);
      if (!w.ok) {
        valid[i] = -1;
        continue;
      }
      std::vector<float> res;
      const float* src = w.mono.data();
      long n_src = static_cast<long>(w.mono.size());
      if (w.rate != target_rate) {
        const long g = gcd_long(w.rate, target_rate);
        const int up = static_cast<int>(target_rate / g);
        const int down = static_cast<int>(w.rate / g);
        const long max_ud = up > down ? up : down;
        const long taps = 2 * 10 * max_ud + 1;  // scipy resample_poly default
        std::vector<float> filt(taps);
        design_lowpass(1.0 / max_ud, 5.0, static_cast<double>(up), taps, filt.data());
        const long n_out = (n_src * up + down - 1) / down;
        res.resize(n_out);
        resample_poly(src, n_src, up, down, filt.data(), taps, res.data(), n_out);
        src = res.data();
        n_src = n_out;
      }
      const long keep = n_src < window ? n_src : window;
      std::memcpy(row, src, sizeof(float) * keep);
      valid[i] = n_src;  // TRUE length: callers detect window overflow
      succeeded.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return succeeded.load();
}

}  // extern "C"
