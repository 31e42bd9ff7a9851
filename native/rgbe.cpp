// Radiance RGBE (.hdr) codec — native fast path for gmdx.
//
// The pure-numpy codec (gmdx/io/rgbe.py) is the reference implementation;
// this mirrors its exact output (same shared-exponent rounding, same
// adaptive-RLE scanlines) at C++ speed for the production export path:
// a 4K HDR frame round-trips in milliseconds instead of the Python RLE
// loop's seconds. Exposed as a C ABI consumed via ctypes
// (gmdx/native/__init__.py); the Python codec remains the fallback.
//
// Build: make -C native   (produces libgmdx_native.so next to this file)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr char kHeader[] = "#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n";

// float RGB -> shared-exponent RGBE, matching rgbe_encode(): mantissa
// round-to-nearest (classic Radiance truncates), zero below 1e-32.
inline void encode_pixel(const float* rgb, uint8_t* out) {
  float r = rgb[0] > 0.f ? rgb[0] : 0.f;
  float g = rgb[1] > 0.f ? rgb[1] : 0.f;
  float b = rgb[2] > 0.f ? rgb[2] : 0.f;
  float maxc = r > g ? (r > b ? r : b) : (g > b ? g : b);
  if (maxc < 1e-32f) {
    out[0] = out[1] = out[2] = out[3] = 0;
    return;
  }
  int e;
  float frac = std::frexp(maxc, &e);
  float scale = frac * 256.0f / maxc;
  float m0 = r * scale + 0.5f, m1 = g * scale + 0.5f, m2 = b * scale + 0.5f;
  out[0] = static_cast<uint8_t>(m0 < 255.f ? m0 : 255.f);
  out[1] = static_cast<uint8_t>(m1 < 255.f ? m1 : 255.f);
  out[2] = static_cast<uint8_t>(m2 < 255.f ? m2 : 255.f);
  out[3] = static_cast<uint8_t>(e + 128);
}

inline void decode_pixel(const uint8_t* rgbe, float* out) {
  if (rgbe[3] == 0) {
    out[0] = out[1] = out[2] = 0.f;
    return;
  }
  float scale = std::ldexp(1.0f, static_cast<int>(rgbe[3]) - 136);
  out[0] = rgbe[0] * scale;
  out[1] = rgbe[1] * scale;
  out[2] = rgbe[2] * scale;
}

// Adaptive RLE for one channel of one scanline (Radiance "new" RLE),
// byte-identical to _rle_encode_channel().
void rle_encode_channel(const uint8_t* ch, int n, std::string* out) {
  int i = 0;
  while (i < n) {
    int run_end = i + 1;
    while (run_end < n && run_end - i < 127 && ch[run_end] == ch[i]) run_end++;
    int run_len = run_end - i;
    if (run_len >= 4) {
      out->push_back(static_cast<char>(128 + run_len));
      out->push_back(static_cast<char>(ch[i]));
      i = run_end;
    } else {
      int lit_end = i;
      while (lit_end < n && lit_end - i < 128) {
        int re = lit_end + 1;
        while (re < n && re - lit_end < 4 && ch[re] == ch[lit_end]) re++;
        if (re - lit_end >= 4) break;
        lit_end++;
      }
      if (lit_end == i) lit_end = (i + 128 < n) ? i + 128 : n;
      out->push_back(static_cast<char>(lit_end - i));
      out->append(reinterpret_cast<const char*>(ch + i), lit_end - i);
      i = lit_end;
    }
  }
}

}  // namespace

extern "C" {

// Write float32 RGB (h, w, 3) as a Radiance .hdr with RLE scanlines.
// Returns 0 on success, negative errno-style codes otherwise.
int gmdx_rgbe_write(const char* path, const float* rgb, int h, int w) {
  if (h <= 0 || w <= 0) return -22;  // EINVAL
  FILE* f = std::fopen(path, "wb");
  if (!f) return -2;  // ENOENT-ish

  std::string buf;
  buf.reserve(static_cast<size_t>(h) * w * 4 + 64);
  buf.append(kHeader);
  char res[48];
  std::snprintf(res, sizeof(res), "-Y %d +X %d\n", h, w);
  buf.append(res);

  std::vector<uint8_t> line(static_cast<size_t>(w) * 4);
  std::vector<uint8_t> chan(static_cast<size_t>(w));
  bool use_rle = (w >= 8 && w < 32768);
  for (int y = 0; y < h; ++y) {
    const float* row = rgb + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) encode_pixel(row + 3 * x, line.data() + 4 * x);
    if (!use_rle) {
      buf.append(reinterpret_cast<char*>(line.data()), line.size());
      continue;
    }
    char marker[4] = {2, 2, static_cast<char>((w >> 8) & 0xFF),
                      static_cast<char>(w & 0xFF)};
    buf.append(marker, 4);
    for (int c = 0; c < 4; ++c) {
      for (int x = 0; x < w; ++x) chan[x] = line[4 * x + c];
      rle_encode_channel(chan.data(), w, &buf);
    }
  }
  size_t written = std::fwrite(buf.data(), 1, buf.size(), f);
  int rc = (written == buf.size()) ? 0 : -5;  // EIO
  std::fclose(f);
  return rc;
}

// Parse the header: fills h/w and the byte offset where pixel data starts.
int gmdx_rgbe_read_header(const char* path, int* h, int* w, long* data_pos) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -2;
  char line[256];
  if (!std::fgets(line, sizeof(line), f) || line[0] != '#' || line[1] != '?') {
    std::fclose(f);
    return -22;
  }
  // Skip header lines until the blank separator.
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == '\n') break;
  }
  if (!std::fgets(line, sizeof(line), f)) {
    std::fclose(f);
    return -22;
  }
  int hh, ww;
  if (std::sscanf(line, "-Y %d +X %d", &hh, &ww) != 2) {
    std::fclose(f);
    return -38;  // ENOSYS: unsupported orientation
  }
  *h = hh;
  *w = ww;
  *data_pos = std::ftell(f);
  std::fclose(f);
  return 0;
}

// Decode pixel data into caller-allocated float32 (h, w, 3).
int gmdx_rgbe_read(const char* path, long data_pos, float* out, int h, int w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -2;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, data_pos, SEEK_SET);
  std::vector<uint8_t> data(static_cast<size_t>(size - data_pos));
  if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
    std::fclose(f);
    return -5;
  }
  std::fclose(f);

  std::vector<uint8_t> line(static_cast<size_t>(w) * 4);
  size_t pos = 0;
  for (int y = 0; y < h; ++y) {
    if (pos >= data.size()) return -5;
    // New-RLE header is (2, 2, hi, lo) with hi < 0x80 and (hi<<8)|lo == w;
    // a flat file whose first pixel is r=2, g=2 must not be misparsed.
    if (w >= 8 && w < 32768 && pos + 3 < data.size() && data[pos] == 2 &&
        data[pos + 1] == 2 && (data[pos + 2] & 0x80) == 0 &&
        ((data[pos + 2] << 8) | data[pos + 3]) == w) {
      pos += 4;  // marker + 16-bit width
      for (int c = 0; c < 4; ++c) {
        int x = 0;
        while (x < w) {
          if (pos >= data.size()) return -5;
          int code = data[pos++];
          if (code > 128) {  // run
            if (pos >= data.size() || x + code - 128 > w) return -5;
            uint8_t v = data[pos++];
            for (int k = 0; k < code - 128; ++k) line[4 * (x + k) + c] = v;
            x += code - 128;
          } else {  // literal
            if (pos + code > data.size() || x + code > w) return -5;
            for (int k = 0; k < code; ++k) line[4 * (x + k) + c] = data[pos + k];
            pos += code;
            x += code;
          }
        }
      }
    } else {
      if (pos + 4 * static_cast<size_t>(w) > data.size()) return -5;
      std::memcpy(line.data(), data.data() + pos, 4 * static_cast<size_t>(w));
      pos += 4 * static_cast<size_t>(w);
    }
    float* row = out + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) decode_pixel(line.data() + 4 * x, row + 3 * x);
  }
  return 0;
}

// In-memory codecs (for tests / pipelines that avoid files).
void gmdx_rgbe_encode(const float* rgb, uint8_t* out, long n_pixels) {
  for (long i = 0; i < n_pixels; ++i) encode_pixel(rgb + 3 * i, out + 4 * i);
}

void gmdx_rgbe_decode(const uint8_t* rgbe, float* out, long n_pixels) {
  for (long i = 0; i < n_pixels; ++i) decode_pixel(rgbe + 4 * i, out + 3 * i);
}

}  // extern "C"
