// Native host-side audio I/O for the data pipeline.
//
// The reference loads audio through torchaudio (C++ I/O) and shells out to
// the sox binary for tempo/gain augmentation (utils/audio.py:7-61). Here the
// native core is self-contained: a RIFF/WAVE decoder (PCM 8/16/24/32,
// IEEE-float 32/64, WAVE_FORMAT_EXTENSIBLE) with channel-mean mono mixdown,
// plus a linear-interpolation resampler for tempo perturbation. Exposed via
// ctypes (mtl_tpu/data/audio.py) with a numerically identical numpy
// fallback; the host pipeline's cold-cache cost is dominated by decode, so
// this keeps cold iterations device-bound too.
//
// Build: g++ -O3 -march=native -shared -fPIC audio_io.cpp -o libaudio.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavData {
  std::vector<uint8_t> fmt;
  std::vector<uint8_t> data;
  bool ok = false;
};

// Stream the RIFF chunk list, keeping only fmt + data (mirrors the Python
// fallback parser in mtl_tpu/data/audio.py:_load_wav_riff, including the
// odd-size chunk padding rule).
WavData read_riff(const char* path) {
  WavData w;
  FILE* f = std::fopen(path, "rb");
  if (!f) return w;
  uint8_t header[12];
  if (std::fread(header, 1, 12, f) != 12 || std::memcmp(header, "RIFF", 4) ||
      std::memcmp(header + 8, "WAVE", 4)) {
    std::fclose(f);
    return w;
  }
  uint8_t chunk[8];
  while (std::fread(chunk, 1, 8, f) == 8) {
    const uint32_t size = chunk[4] | (chunk[5] << 8) | (chunk[6] << 16) |
                          (uint32_t(chunk[7]) << 24);
    const uint32_t padded = size + (size & 1);
    if (!std::memcmp(chunk, "fmt ", 4)) {
      w.fmt.resize(size);
      if (std::fread(w.fmt.data(), 1, size, f) != size) break;
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else if (!std::memcmp(chunk, "data", 4)) {
      w.data.resize(size);
      if (std::fread(w.data.data(), 1, size, f) != size) w.data.resize(0);
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else {
      std::fseek(f, long(padded), SEEK_CUR);
    }
    if (!w.fmt.empty() && !w.data.empty()) break;
  }
  std::fclose(f);
  w.ok = w.fmt.size() >= 16 && !w.data.empty();
  return w;
}

uint16_t le16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t le32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

struct Fmt {
  uint16_t codec, channels, bits;
  uint32_t rate;
};

Fmt parse_fmt(const std::vector<uint8_t>& fmt) {
  Fmt r;
  r.codec = le16(&fmt[0]);
  r.channels = le16(&fmt[2]);
  r.rate = le32(&fmt[4]);
  r.bits = le16(&fmt[14]);
  if (r.codec == 0xFFFE && fmt.size() >= 26) r.codec = le16(&fmt[24]);
  return r;
}

// per-sample decode to float in [-1, 1] — the exact scaling constants of
// mtl_tpu/data/audio.py:_pcm_to_float
double sample_at(const uint8_t* d, size_t i, const Fmt& f) {
  switch (f.codec) {
    case 1:  // PCM
      switch (f.bits) {
        case 16: {
          int16_t v;
          std::memcpy(&v, d + 2 * i, 2);
          return v / 32768.0;
        }
        case 32: {
          int32_t v;
          std::memcpy(&v, d + 4 * i, 4);
          return v / 2147483648.0;
        }
        case 8:
          return (d[i] - 128.0) / 128.0;
        case 24: {
          int32_t v = d[3 * i] | (d[3 * i + 1] << 8) | (d[3 * i + 2] << 16);
          if (v >= (1 << 23)) v -= (1 << 24);
          return v / double(1 << 23);
        }
      }
      return 0.0;
    case 3:  // IEEE float
      if (f.bits == 32) {
        float v;
        std::memcpy(&v, d + 4 * i, 4);
        return v;
      }
      if (f.bits == 64) {
        double v;
        std::memcpy(&v, d + 8 * i, 8);
        return v;
      }
      return 0.0;
    default:
      return 0.0;
  }
}

bool supported(const Fmt& f) {
  if (f.codec == 1) return f.bits == 8 || f.bits == 16 || f.bits == 24 ||
                           f.bits == 32;
  if (f.codec == 3) return f.bits == 32 || f.bits == 64;
  return false;
}

}  // namespace

extern "C" {

// Probe: fills *n_mono (mono sample count) and *sample_rate.
// Returns 0 on success, -1 on unreadable/non-RIFF, -2 on unsupported codec.
int32_t wav_probe(const char* path, int64_t* n_mono, int32_t* sample_rate) {
  WavData w = read_riff(path);
  if (!w.ok) return -1;
  Fmt f = parse_fmt(w.fmt);
  if (!supported(f) || f.channels == 0) return -2;
  const size_t bytes_per = f.bits / 8;
  const size_t n_samples = w.data.size() / bytes_per;
  *n_mono = int64_t(n_samples / f.channels);  // trims a partial tail frame
  *sample_rate = int32_t(f.rate);
  return 0;
}

// Decode to mono float32 (channel mean, float64 accumulate like numpy's
// .mean). `out` must hold n_mono floats (from wav_probe). Returns 0 on
// success. The common codecs get tight vectorizable loops — a per-sample
// format switch measured SLOWER than numpy's SIMD path.
int32_t wav_decode(const char* path, float* out, int64_t n_mono) {
  WavData w = read_riff(path);
  if (!w.ok) return -1;
  Fmt f = parse_fmt(w.fmt);
  if (!supported(f) || f.channels == 0) return -2;
  const uint8_t* d = w.data.data();
  const int ch = f.channels;
  if (ch == 1 && f.codec == 1 && f.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(d);
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n_mono; ++i) out[i] = s[i] * k;
    return 0;
  }
  if (ch == 1 && f.codec == 3 && f.bits == 32) {
    std::memcpy(out, d, size_t(n_mono) * 4);
    return 0;
  }
  if (ch == 1 && f.codec == 1 && f.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(d);
    constexpr double k = 1.0 / 2147483648.0;
    for (int64_t i = 0; i < n_mono; ++i) out[i] = float(s[i] * k);
    return 0;
  }
  if (ch == 2 && f.codec == 1 && f.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(d);
    constexpr double k = 0.5 / 32768.0;
    for (int64_t i = 0; i < n_mono; ++i)
      out[i] = float((double(s[2 * i]) + double(s[2 * i + 1])) * k);
    return 0;
  }
  for (int64_t i = 0; i < n_mono; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) acc += sample_at(d, size_t(i) * ch + c, f);
    out[i] = float(acc / ch);
  }
  return 0;
}

// Linear-interpolation resample matching numpy:
//   x_new = linspace(0, n_in-1, n_out); out = interp(x_new, arange(n_in), in)
// (mtl_tpu/data/audio.py:resample_linear — tempo perturbation).
void resample_linear_f32(const float* in, int64_t n_in, int64_t n_out,
                         float* out) {
  if (n_in <= 1) {
    for (int64_t i = 0; i < n_out; ++i) out[i] = n_in ? in[0] : 0.0f;
    return;
  }
  const double step = double(n_in - 1) / double(n_out - 1 ? n_out - 1 : 1);
  for (int64_t i = 0; i < n_out; ++i) {
    const double x = (n_out == 1) ? 0.0 : i * step;
    int64_t lo = int64_t(x);
    if (lo >= n_in - 1) lo = n_in - 2;
    const double t = x - lo;
    out[i] = float(double(in[lo]) * (1.0 - t) + double(in[lo + 1]) * t);
  }
}

}  // extern "C"
