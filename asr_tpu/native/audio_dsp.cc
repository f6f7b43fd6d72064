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
