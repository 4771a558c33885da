// Native WAV reader + framer: the data-loading runtime of voxtpu.
//
// Role parity: the reference's drivers read WAVs with the native Rust `hound`
// crate and frame with `sample::window::Windower`
// (/root/reference/tests/lib.rs:15-19, 71-83). voxtpu keeps ingest native too:
// this C++ module parses RIFF/PCM, normalizes integer samples with the
// reference's `s / (i32::MAX >> (32 - bits))` convention, and materializes the
// strided (F, frame_len) batch directly into caller-provided memory, so the
// Python layer never touches per-sample loops. Exposed through ctypes (no
// pybind11 in this image).
//
// Build: see voxtpu/native/__init__.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t format = 0;          // resolved: 1 = integer PCM, 3 = IEEE float
  uint16_t container_bits = 0;  // storage width per sample
  uint16_t valid_bits = 0;      // significant HIGH bits (== container for
                                // plain PCM; < container for e.g. 24-in-32
                                // WAVE_FORMAT_EXTENSIBLE files)
  uint16_t channels = 0;
  uint64_t n_frames = 0;  // per-channel sample count
};

// KSDATAFORMAT_SUBTYPE_* GUID bytes 2..15 (bytes 0-1 are the format code):
// {xxxxxx-0000-0010-8000-00AA00389B71}.
static const uint8_t kSubformatGuidTail[14] = {
    0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
    0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71};

bool format_supported(const WavInfo& info) {
  if (info.format == 3)  // IEEE float: f32 or f64 containers, fully valid
    return (info.container_bits == 32 || info.container_bits == 64) &&
           info.valid_bits == info.container_bits;
  if (info.format != 1) return false;
  if (info.container_bits != 8 && info.container_bits != 16 &&
      info.container_bits != 24 && info.container_bits != 32)
    return false;
  return info.valid_bits >= 1 && info.valid_bits <= info.container_bits;
}

// Parses header; fills info + data chunk offset/size. Walks EVERY chunk
// (fmt/data in either order, last occurrence wins) and clamps a data ck_len
// declared past EOF to the bytes that exist — truncated recordings decode
// their integral sample prefix. Semantics mirror the Python RIFF walker
// (voxtpu/io_wav.py) exactly; tests/test_wav_fuzz.py pins the equivalence.
bool parse_wav(const uint8_t* buf, uint64_t len, WavInfo* info,
               uint64_t* data_off, uint64_t* data_len) {
  if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  uint64_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= len) {
    const uint8_t* ck = buf + pos;
    uint32_t ck_len;
    memcpy(&ck_len, ck + 4, 4);
    uint64_t body = pos + 8;
    if (memcmp(ck, "fmt ", 4) == 0 && body + 16 <= len) {
      uint16_t fmt;
      memcpy(&fmt, buf + body, 2);
      memcpy(&info->channels, buf + body + 2, 2);
      memcpy(&info->sample_rate, buf + body + 4, 4);
      memcpy(&info->container_bits, buf + body + 14, 2);
      info->valid_bits = info->container_bits;
      if (fmt == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format is the SubFormat GUID and
        // the significant width is wValidBitsPerSample — ignoring either
        // decodes e.g. 24-in-32 content at the wrong scale (silently).
        if (ck_len < 40 || body + 40 > len) return false;
        uint16_t vb;
        memcpy(&vb, buf + body + 18, 2);
        if (vb) info->valid_bits = vb;
        if (memcmp(buf + body + 26, kSubformatGuidTail, 14) != 0) return false;
        memcpy(&fmt, buf + body + 24, 2);
      }
      if (fmt != 1 && fmt != 3) return false;
      info->format = fmt;
      have_fmt = true;
    } else if (memcmp(ck, "data", 4) == 0) {
      *data_off = body;
      *data_len = ck_len;
      if (*data_off + *data_len > len)
        *data_len = *data_off < len ? len - *data_off : 0;
      have_data = true;
    }
    pos = body + ck_len + (ck_len & 1);
  }
  if (!have_fmt || !have_data) return false;
  if (info->channels == 0 || !format_supported(*info)) return false;
  uint32_t bytes_per = (info->container_bits / 8) * info->channels;
  if (bytes_per == 0) return false;
  info->n_frames = *data_len / bytes_per;
  return true;
}

template <typename F>
void decode_samples(const uint8_t* data, uint64_t n, const WavInfo& info,
                    uint16_t chan, F* out) {
  const uint16_t channels = info.channels;
  if (info.format == 3) {  // IEEE float: already normalized
    if (info.container_bits == 32) {
      const float* s = reinterpret_cast<const float*>(data);
      for (uint64_t i = 0; i < n; ++i) out[i] = (F)s[i * channels + chan];
    } else {
      const double* s = reinterpret_cast<const double*>(data);
      for (uint64_t i = 0; i < n; ++i) out[i] = (F)s[i * channels + chan];
    }
    return;
  }
  // Integer PCM. Extensible data is left-justified in its container: drop the
  // low (container - valid) padding bits, then apply the reference's
  // `s / (i32::MAX >> (32 - bits))` normalization at the VALID width
  // (tests/lib.rs:17-19).
  const int shift = info.container_bits - info.valid_bits;
  const double scale = (double)(INT32_MAX >> (32 - info.valid_bits));
  const uint16_t bits = info.container_bits;
  if (bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(data);
    for (uint64_t i = 0; i < n; ++i)
      out[i] = (F)((s[i * channels + chan] >> shift) / scale);
  } else if (bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(data);
    for (uint64_t i = 0; i < n; ++i)
      out[i] = (F)((s[i * channels + chan] >> shift) / scale);
  } else if (bits == 8) {
    for (uint64_t i = 0; i < n; ++i)
      out[i] = (F)((((int)data[i * channels + chan] - 128) >> shift) / scale);
  } else if (bits == 24) {
    for (uint64_t i = 0; i < n; ++i) {
      const uint8_t* p = data + (i * channels + chan) * 3;
      int32_t v = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = (F)((v >> shift) / scale);
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success. Fills sample_rate/bits/channels/n (per-channel count).
int voxtpu_wav_info(const char* path, uint32_t* sample_rate, uint32_t* bits,
                    uint32_t* channels, uint64_t* n) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  if (len < 0) {
    fclose(f);
    return 2;
  }
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (fread(buf.data(), 1, len, f) != (size_t)len) {
    fclose(f);
    return 2;
  }
  fclose(f);
  WavInfo info;
  uint64_t off, dlen;
  if (!parse_wav(buf.data(), len, &info, &off, &dlen)) return 3;
  *sample_rate = info.sample_rate;
  *bits = info.valid_bits;  // the significant width (what the scale uses)
  *channels = info.channels;
  *n = info.n_frames;
  return 0;
}

// Reads channel `chan` into out, float32 or float64 depending on `f64`.
// `capacity` is the caller's element count (from voxtpu_wav_info); the file is
// re-parsed here, so a file that grew between the two calls is clamped to
// `capacity` samples instead of overflowing the buffer. Returns 0 on success.
int voxtpu_wav_read(const char* path, uint32_t chan, int f64, void* out,
                    uint64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  if (len < 0) {
    fclose(f);
    return 2;
  }
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (fread(buf.data(), 1, len, f) != (size_t)len) {
    fclose(f);
    return 2;
  }
  fclose(f);
  WavInfo info;
  uint64_t off, dlen;
  if (!parse_wav(buf.data(), len, &info, &off, &dlen)) return 3;
  if (chan >= info.channels) return 4;
  if (!format_supported(info)) return 5;  // parse_wav enforces this already
  uint64_t n = info.n_frames < capacity ? info.n_frames : capacity;
  if (f64)
    decode_samples(buf.data() + off, n, info, chan, (double*)out);
  else
    decode_samples(buf.data() + off, n, info, chan, (float*)out);
  if (n < capacity) {
    // File shrank between voxtpu_wav_info and here: zero the tail so the
    // caller's buffer holds no uninitialized memory, and report it.
    if (f64)
      memset((double*)out + n, 0, (capacity - n) * sizeof(double));
    else
      memset((float*)out + n, 0, (capacity - n) * sizeof(float));
    return 6;
  }
  return 0;
}

// Strided framing: x (n) -> frames (F, frame_len), F = (n-frame_len)/hop + 1.
// Caller allocates. float32 variant; the f64 twin below.
void voxtpu_frame_f32(const float* x, uint64_t n, uint64_t frame_len,
                      uint64_t hop, float* out) {
  if (n < frame_len) return;
  uint64_t F = (n - frame_len) / hop + 1;
  for (uint64_t i = 0; i < F; ++i)
    memcpy(out + i * frame_len, x + i * hop, frame_len * sizeof(float));
}

void voxtpu_frame_f64(const double* x, uint64_t n, uint64_t frame_len,
                      uint64_t hop, double* out) {
  if (n < frame_len) return;
  uint64_t F = (n - frame_len) / hop + 1;
  for (uint64_t i = 0; i < F; ++i)
    memcpy(out + i * frame_len, x + i * hop, frame_len * sizeof(double));
}

}  // extern "C"
