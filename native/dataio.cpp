// Native data-loader core: wav decode + batch collate.
//
// The reference delegates data loading to torch DataLoader workers
// (data_utils.py); here the byte-level hot path — RIFF/PCM16 wav parsing,
// normalization to [-1, 1] floats, and zero-padded batch assembly with gate
// targets (reference TextMelCollate semantics, data_utils.py:82-137) — is
// C++, exposed through a C ABI consumed via ctypes
// (tacotron2_vae_tpu/data/native.py).  Build: make -C native
//
// All functions return 0 on success, negative error codes on failure.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode (RIFF, PCM16 mono or first channel of multichannel)
// ---------------------------------------------------------------------------

// Parses header only; writes sample count and sample rate.
int wav_info(const char* path, int64_t* n_samples, int32_t* sample_rate);

// Decodes into caller-allocated float buffer (normalized by `scale`, e.g.
// 32768.0).  `out` must hold at least n_samples floats (from wav_info).
int wav_read(const char* path, float* out, int64_t out_len, float scale);

// ---------------------------------------------------------------------------
// Batch collate
// ---------------------------------------------------------------------------

// Zero-pads `B` variable-length float32 mel spectrograms (n_mel x T_i,
// row-major, concatenated in `mels` with offsets) into `mel_out`
// (B x n_mel x T_max), builds `gate_out` (B x T_max) with 1.0 from the last
// valid frame on (reference data_utils.py:133).
int collate_mels(const float* mels, const int64_t* offsets,
                 const int32_t* lengths, int32_t batch, int32_t n_mel,
                 int32_t t_max, float* mel_out, float* gate_out);

// Zero-pads int32 token sequences into (B x S_max).
int collate_text(const int32_t* tokens, const int64_t* offsets,
                 const int32_t* lengths, int32_t batch, int32_t s_max,
                 int32_t* text_out);

}  // extern "C"

namespace {

struct RiffReader {
  FILE* f = nullptr;
  ~RiffReader() {
    if (f) fclose(f);
  }
};

bool read_exact(FILE* f, void* buf, size_t n) {
  return fread(buf, 1, n, f) == n;
}

struct WavFmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_pos = -1;
  uint32_t data_bytes = 0;
};

int parse_wav(FILE* f, WavFmt* fmt) {
  char magic[4];
  uint32_t riff_size;
  if (!read_exact(f, magic, 4) || memcmp(magic, "RIFF", 4) != 0) return -2;
  if (!read_exact(f, &riff_size, 4)) return -2;
  if (!read_exact(f, magic, 4) || memcmp(magic, "WAVE", 4) != 0) return -2;

  while (true) {
    char chunk_id[4];
    uint32_t chunk_size;
    if (!read_exact(f, chunk_id, 4) || !read_exact(f, &chunk_size, 4)) break;
    if (memcmp(chunk_id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (chunk_size < 16 || !read_exact(f, buf, 16)) return -3;
      memcpy(&fmt->format, buf + 0, 2);
      memcpy(&fmt->channels, buf + 2, 2);
      memcpy(&fmt->sample_rate, buf + 4, 4);
      memcpy(&fmt->bits, buf + 14, 2);
      if (chunk_size > 16) fseek(f, chunk_size - 16, SEEK_CUR);
    } else if (memcmp(chunk_id, "data", 4) == 0) {
      fmt->data_pos = ftell(f);
      fmt->data_bytes = chunk_size;
      fseek(f, (chunk_size + 1) & ~1u, SEEK_CUR);
    } else {
      fseek(f, (chunk_size + 1) & ~1u, SEEK_CUR);
    }
    if (fmt->data_pos >= 0 && fmt->sample_rate) break;
  }
  if (fmt->data_pos < 0 || !fmt->sample_rate) return -4;
  if (fmt->format != 1 || fmt->bits != 16) return -5;  // PCM16 only
  if (fmt->channels == 0) return -5;
  return 0;
}

}  // namespace

int wav_info(const char* path, int64_t* n_samples, int32_t* sample_rate) {
  RiffReader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  WavFmt fmt;
  int rc = parse_wav(r.f, &fmt);
  if (rc) return rc;
  *n_samples = fmt.data_bytes / (2 * fmt.channels);
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  return 0;
}

int wav_read(const char* path, float* out, int64_t out_len, float scale) {
  RiffReader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  WavFmt fmt;
  int rc = parse_wav(r.f, &fmt);
  if (rc) return rc;
  const int64_t n = fmt.data_bytes / (2 * fmt.channels);
  if (n > out_len) return -6;
  fseek(r.f, fmt.data_pos, SEEK_SET);

  const float inv = scale != 0.0f ? 1.0f / scale : 1.0f;
  const int ch = fmt.channels;
  std::vector<int16_t> buf(4096 * ch);
  int64_t written = 0;
  while (written < n) {
    const int64_t want =
        std::min<int64_t>(4096, n - written) * ch;
    if (fread(buf.data(), 2, want, r.f) != static_cast<size_t>(want))
      return -7;
    const int64_t frames = want / ch;
    for (int64_t i = 0; i < frames; ++i)
      out[written + i] = static_cast<float>(buf[i * ch]) * inv;
    written += frames;
  }
  return 0;
}

int collate_mels(const float* mels, const int64_t* offsets,
                 const int32_t* lengths, int32_t batch, int32_t n_mel,
                 int32_t t_max, float* mel_out, float* gate_out) {
  for (int32_t b = 0; b < batch; ++b) {
    const int32_t t = lengths[b];
    if (t > t_max || t <= 0) return -1;
    const float* src = mels + offsets[b];
    float* dst = mel_out + static_cast<int64_t>(b) * n_mel * t_max;
    for (int32_t m = 0; m < n_mel; ++m) {
      memcpy(dst + static_cast<int64_t>(m) * t_max,
             src + static_cast<int64_t>(m) * t, t * sizeof(float));
      memset(dst + static_cast<int64_t>(m) * t_max + t, 0,
             (t_max - t) * sizeof(float));
    }
    float* gate = gate_out + static_cast<int64_t>(b) * t_max;
    std::fill(gate, gate + t - 1, 0.0f);
    std::fill(gate + t - 1, gate + t_max, 1.0f);  // data_utils.py:133
  }
  return 0;
}

int collate_text(const int32_t* tokens, const int64_t* offsets,
                 const int32_t* lengths, int32_t batch, int32_t s_max,
                 int32_t* text_out) {
  for (int32_t b = 0; b < batch; ++b) {
    const int32_t s = lengths[b];
    if (s > s_max || s < 0) return -1;
    int32_t* dst = text_out + static_cast<int64_t>(b) * s_max;
    memcpy(dst, tokens + offsets[b], s * sizeof(int32_t));
    memset(dst + s, 0, (s_max - s) * sizeof(int32_t));
  }
  return 0;
}
