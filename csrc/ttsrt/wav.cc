#include "wav.h"

#include <cstdio>
#include <cstring>

namespace ttsrt {

namespace {

struct Reader {
  FILE* f;
  bool ok = true;
  uint32_t u32() {
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { ok = false; return 0; }
    return b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  uint16_t u16() {
    uint8_t b[2];
    if (fread(b, 1, 2, f) != 2) { ok = false; return 0; }
    return b[0] | (b[1] << 8);
  }
};

}  // namespace

bool ReadWav(const std::string& path, Wav* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  Reader r{f};
  char tag[5] = {0};
  if (fread(tag, 1, 4, f) != 4 || strcmp(tag, "RIFF") != 0) { fclose(f); return false; }
  r.u32();  // riff size
  if (fread(tag, 1, 4, f) != 4 || strcmp(tag, "WAVE") != 0) { fclose(f); return false; }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool got_fmt = false;

  while (r.ok) {
    if (fread(tag, 1, 4, f) != 4) break;
    uint32_t size = r.u32();
    if (!r.ok) break;
    if (strcmp(tag, "fmt ") == 0) {
      format = r.u16();
      channels = r.u16();
      sample_rate = r.u32();
      r.u32();  // byte rate
      r.u16();  // block align
      bits = r.u16();
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      got_fmt = true;
    } else if (strcmp(tag, "data") == 0) {
      if (!got_fmt || channels == 0) { fclose(f); return false; }
      std::vector<uint8_t> raw(size);
      if (fread(raw.data(), 1, size, f) != size) { fclose(f); return false; }
      int64_t n_frames = 0;
      int bytes_per = bits / 8;
      if (bytes_per == 0) { fclose(f); return false; }
      n_frames = size / (bytes_per * channels);
      out->sample_rate = static_cast<int>(sample_rate);
      out->samples.assign(n_frames, 0.f);
      for (int64_t i = 0; i < n_frames; ++i) {
        float acc = 0.f;
        for (int c = 0; c < channels; ++c) {
          const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
          float v = 0.f;
          if (format == 3 && bits == 32) {  // IEEE float
            float fv;
            memcpy(&fv, p, 4);
            v = fv;
          } else if (bits == 16) {
            int16_t s = int16_t(p[0] | (p[1] << 8));
            v = s / 32768.f;
          } else if (bits == 32) {
            int32_t s;
            memcpy(&s, p, 4);
            v = s / 2147483648.f;
          } else if (bits == 8) {
            v = (int(p[0]) - 128) / 128.f;
          }
          acc += v;
        }
        out->samples[i] = acc / channels;
      }
      fclose(f);
      return true;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  return false;
}

bool WriteWav16(const std::string& path, const float* samples, int64_t n,
                int sample_rate) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  auto w32 = [&](uint32_t v) { fwrite(&v, 4, 1, f); };
  auto w16 = [&](uint16_t v) { fwrite(&v, 2, 1, f); };
  uint32_t data_size = uint32_t(n * 2);
  fwrite("RIFF", 1, 4, f);
  w32(36 + data_size);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  w32(16);
  w16(1);  // PCM
  w16(1);  // mono
  w32(sample_rate);
  w32(sample_rate * 2);
  w16(2);
  w16(16);
  fwrite("data", 1, 4, f);
  w32(data_size);
  for (int64_t i = 0; i < n; ++i) {
    float v = samples[i];
    if (v > 1.f) v = 1.f;
    if (v < -1.f) v = -1.f;
    int16_t s = int16_t(v * 32767.f);
    fwrite(&s, 2, 1, f);
  }
  fclose(f);
  return true;
}

}  // namespace ttsrt
