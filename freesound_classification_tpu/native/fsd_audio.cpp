// fsd_audio — native audio decode/resample core for the data loader.
//
// The reference's data-loading hot path is librosa/audioread decode in
// forked torch DataLoader workers (reference train_2d_cnn.py:272-274,
// SURVEY.md §3.1 hot loops). This library is the TPU framework's native
// equivalent: a dependency-free RIFF/WAVE parser (PCM 8/16/24/32, float
// 32/64, multi-channel -> mono float32 in [-1, 1]) plus a linear resampler,
// exposed with a C ABI consumed from Python via ctypes
// (freesound_classification_tpu/native/__init__.py). The python
// data.audio_io module is the correctness oracle and fallback.
//
// Build: `make` in this directory -> libfsdaudio.so.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f;
  explicit Reader(const char* path) { f = std::fopen(path, "rb"); }
  ~Reader() {
    if (f) std::fclose(f);
  }
  bool ok() const { return f != nullptr; }
  bool read(void* dst, size_t n) { return std::fread(dst, 1, n, f) == n; }
  bool skip(long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
};

struct WavFormat {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float, 0xFFFE = extensible
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

// Parses up to the data chunk; returns data byte count via *data_bytes and
// leaves the file positioned at the start of sample data.
bool parse_header(Reader& r, WavFormat* fmt, uint32_t* data_bytes) {
  char tag[4];
  uint32_t size;
  if (!r.read(tag, 4) || std::memcmp(tag, "RIFF", 4) != 0) return false;
  if (!r.read(&size, 4)) return false;
  if (!r.read(tag, 4) || std::memcmp(tag, "WAVE", 4) != 0) return false;

  bool have_fmt = false;
  while (r.read(tag, 4) && r.read(&size, 4)) {
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t take = size < sizeof(buf) ? size : (uint32_t)sizeof(buf);
      if (!r.read(buf, take)) return false;
      if (size > take && !r.skip(size - take)) return false;
      std::memcpy(&fmt->format, buf + 0, 2);
      std::memcpy(&fmt->channels, buf + 2, 2);
      std::memcpy(&fmt->sample_rate, buf + 4, 4);
      std::memcpy(&fmt->bits, buf + 14, 2);
      if (fmt->format == 0xFFFE && size >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: subformat GUID's first 2 bytes
        std::memcpy(&fmt->format, buf + 24, 2);
      }
      have_fmt = true;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      *data_bytes = size;
      return have_fmt;
    } else {
      if (!r.skip(size + (size & 1))) return false;  // chunks are word-aligned
    }
  }
  return false;
}

inline float clamp1(float v) {
  return v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
}

}  // namespace

extern "C" {

// Header-only scan: frames per channel and sample rate. Returns 0 on
// success, negative on parse failure.
int fsd_wav_info(const char* path, int64_t* frames, int32_t* sample_rate) {
  Reader r(path);
  if (!r.ok()) return -1;
  WavFormat fmt;
  uint32_t data_bytes = 0;
  if (!parse_header(r, &fmt, &data_bytes)) return -2;
  if (fmt.channels == 0 || fmt.bits == 0) return -3;
  *frames = (int64_t)data_bytes / ((fmt.bits / 8) * fmt.channels);
  *sample_rate = (int32_t)fmt.sample_rate;
  return 0;
}

// Decode to mono float32. `out` has room for `max_samples`; returns the
// number of samples written (decoded frames clipped to max_samples), or a
// negative error. `*sample_rate` receives the file's rate.
int64_t fsd_read_wav(const char* path, float* out, int64_t max_samples,
                     int32_t* sample_rate) {
  Reader r(path);
  if (!r.ok()) return -1;
  WavFormat fmt;
  uint32_t data_bytes = 0;
  if (!parse_header(r, &fmt, &data_bytes)) return -2;
  if (fmt.channels == 0 || fmt.bits == 0) return -3;
  *sample_rate = (int32_t)fmt.sample_rate;

  const int bytes_per_sample = fmt.bits / 8;
  const int frame_bytes = bytes_per_sample * fmt.channels;
  int64_t frames = (int64_t)data_bytes / frame_bytes;
  if (frames > max_samples) frames = max_samples;

  std::vector<uint8_t> buf((size_t)frame_bytes * 4096);
  const float inv_ch = 1.0f / fmt.channels;
  int64_t written = 0;
  while (written < frames) {
    int64_t todo = frames - written;
    if (todo > 4096) todo = 4096;
    if (!r.read(buf.data(), (size_t)todo * frame_bytes)) break;
    const uint8_t* p = buf.data();
    for (int64_t i = 0; i < todo; ++i) {
      float acc = 0.f;
      for (int c = 0; c < fmt.channels; ++c) {
        const uint8_t* s = p + (size_t)i * frame_bytes + c * bytes_per_sample;
        float v = 0.f;
        if (fmt.format == 3) {  // IEEE float
          if (fmt.bits == 32) {
            float f32;
            std::memcpy(&f32, s, 4);
            v = f32;
          } else if (fmt.bits == 64) {
            double f64;
            std::memcpy(&f64, s, 8);
            v = (float)f64;
          }
        } else {  // PCM
          if (fmt.bits == 16) {
            int16_t i16;
            std::memcpy(&i16, s, 2);
            v = i16 / 32768.f;
          } else if (fmt.bits == 32) {
            int32_t i32;
            std::memcpy(&i32, s, 4);
            v = (float)(i32 / 2147483648.0);
          } else if (fmt.bits == 24) {
            int32_t i32 = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                                    (uint32_t)s[2] << 24) >>
                          8;
            v = (float)(i32 / 8388608.0);
          } else if (fmt.bits == 8) {
            v = ((int)s[0] - 128) / 128.f;
          }
        }
        acc += v;
      }
      out[written + i] = clamp1(acc * inv_ch);
    }
    written += todo;
  }
  return written;
}

// Linear-interpolation resample of `n` samples to `m` samples.
void fsd_resample_linear(const float* in, int64_t n, float* out, int64_t m) {
  if (n <= 1 || m <= 0) {
    for (int64_t j = 0; j < m; ++j) out[j] = n > 0 ? in[0] : 0.f;
    return;
  }
  const double step = (double)n / (double)m;
  for (int64_t j = 0; j < m; ++j) {
    double pos = j * step;
    int64_t i0 = (int64_t)pos;
    if (i0 >= n - 1) i0 = n - 2;
    float frac = (float)(pos - i0);
    out[j] = in[i0] * (1.f - frac) + in[i0 + 1] * frac;
  }
}

// Decode straight into one padded row of a batch matrix: zero-fill the
// tail, return valid samples. Saves a Python-side copy per clip.
int64_t fsd_read_wav_padded(const char* path, float* row, int64_t row_len,
                            int32_t* sample_rate) {
  int64_t n = fsd_read_wav(path, row, row_len, sample_rate);
  if (n < 0) return n;
  if (n < row_len) std::memset(row + n, 0, (size_t)(row_len - n) * 4);
  return n;
}

}  // extern "C"
