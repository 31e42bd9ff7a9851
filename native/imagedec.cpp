// Batch image decode + preprocess — the native data-loader hot path.
//
// The reference's training input pipeline is PIL decode + torchvision
// transforms on the Python side of a DataLoader (train_gm_unet.py:917-992).
// gmdx keeps the same semantics (gmdx/data/transforms.py) but moves the
// per-batch work — PNG/JPEG decode, shorter-side triangle resize
// (Pillow-compatible), paired crop, horizontal flip, [-1,1] CHW float32
// normalize — into one C++ call over a thread pool, so the host input
// pipeline keeps up with the TPU step without fighting the GIL.
//
// Resize matches Pillow's convolution resampling (triangle filter with
// support scaled by the downscale ratio, horizontal pass then vertical,
// uint8 quantization between passes) to within 1 LSB; output dimension
// rounding is banker's (std::nearbyint) to match Python round().
//
// C ABI consumed via ctypes (gmdx/native/__init__.py); the PIL/numpy
// implementation remains the fallback and the semantic reference.
//
// Build: make -C native  (links -lpng -ljpeg)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct ImageU8 {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

bool is_png(const uint8_t* d, int64_t n) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  return n >= 8 && 0 == memcmp(d, sig, 8);
}

bool is_jpeg(const uint8_t* d, int64_t n) {
  return n >= 3 && d[0] == 0xFF && d[1] == 0xD8 && d[2] == 0xFF;
}

// 16-bit PNGs are rejected (not converted): libpng's simplified API scales
// 16->8 while PIL's convert("RGB") from I;16 clips — the results diverge,
// so those images must take the PIL fallback to keep the batch-parity
// contract of the native loader.
bool png_is_16bit(const png_image& img) {
  return (img.format & PNG_FORMAT_FLAG_LINEAR) != 0;
}

// PNG via the libpng simplified API. Alpha is decoded and dropped (not
// composited) — PIL's convert("RGB") semantics for RGBA inputs.
bool decode_png(const uint8_t* data, int64_t len, ImageU8* out) {
  png_image img;
  memset(&img, 0, sizeof img);
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data, (size_t)len))
    return false;
  if (png_is_16bit(img)) {
    png_image_free(&img);
    return false;
  }
  img.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> rgba((size_t)PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  out->w = (int)img.width;
  out->h = (int)img.height;
  out->rgb.resize((size_t)out->w * out->h * 3);
  const uint8_t* s = rgba.data();
  uint8_t* d = out->rgb.data();
  for (size_t i = 0, npx = (size_t)out->w * out->h; i < npx; ++i) {
    d[0] = s[0];
    d[1] = s[1];
    d[2] = s[2];
    d += 3;
    s += 4;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(const uint8_t* data, int64_t len, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = (int)cinfo.output_width;
  out->h = (int)cinfo.output_height;
  out->rgb.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_any(const uint8_t* data, int64_t len, ImageU8* out) {
  if (is_png(data, len)) return decode_png(data, len, out);
  if (is_jpeg(data, len)) return decode_jpeg(data, len, out);
  return false;
}

// Pillow-compatible resample coefficients: triangle (bilinear) filter whose
// support widens with the downscale ratio (antialiasing). Mirrors
// Pillow's precompute_coeffs.
struct Coeffs {
  std::vector<int> xmin, xlen;      // per output index
  std::vector<double> k;            // ksize weights per output index
  int ksize = 0;
};

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle support = 1
  c.ksize = (int)std::ceil(support) * 2 + 1;
  c.xmin.resize(out_size);
  c.xlen.resize(out_size);
  c.k.assign((size_t)out_size * c.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double* k = &c.k[(size_t)xx * c.ksize];
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double t = (x - center + 0.5) / filterscale;
      double w = (t < 0 ? 1.0 + t : 1.0 - t);
      if (w < 0) w = 0;
      k[x - xmin] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax - xmin; ++x) k[x] /= ww;
    c.xmin[xx] = xmin;
    c.xlen[xx] = xmax - xmin;
  }
  return c;
}

inline uint8_t clip8(double v) {
  int i = (int)(v + 0.5);
  return (uint8_t)(i < 0 ? 0 : (i > 255 ? 255 : i));
}

// Horizontal-then-vertical separable resample with uint8 quantization
// between passes (Pillow's 8bpc pipeline).
void resize_triangle(const ImageU8& in, int nw, int nh, ImageU8* out) {
  const ImageU8* src = &in;
  ImageU8 tmp;
  if (nw != in.w) {
    Coeffs c = precompute_coeffs(in.w, nw);
    tmp.w = nw;
    tmp.h = in.h;
    tmp.rgb.resize((size_t)nw * in.h * 3);
    for (int y = 0; y < in.h; ++y) {
      const uint8_t* row = in.rgb.data() + (size_t)y * in.w * 3;
      uint8_t* orow = tmp.rgb.data() + (size_t)y * nw * 3;
      for (int xx = 0; xx < nw; ++xx) {
        const double* k = &c.k[(size_t)xx * c.ksize];
        int x0 = c.xmin[xx], n = c.xlen[xx];
        double s0 = 0, s1 = 0, s2 = 0;
        for (int i = 0; i < n; ++i) {
          const uint8_t* px = row + (size_t)(x0 + i) * 3;
          s0 += px[0] * k[i];
          s1 += px[1] * k[i];
          s2 += px[2] * k[i];
        }
        orow[xx * 3 + 0] = clip8(s0);
        orow[xx * 3 + 1] = clip8(s1);
        orow[xx * 3 + 2] = clip8(s2);
      }
    }
    src = &tmp;
  }
  if (nh != src->h) {
    Coeffs c = precompute_coeffs(src->h, nh);
    out->w = src->w;
    out->h = nh;
    out->rgb.resize((size_t)src->w * nh * 3);
    for (int yy = 0; yy < nh; ++yy) {
      const double* k = &c.k[(size_t)yy * c.ksize];
      int y0 = c.xmin[yy], n = c.xlen[yy];
      uint8_t* orow = out->rgb.data() + (size_t)yy * src->w * 3;
      for (int x = 0; x < src->w; ++x) {
        double s0 = 0, s1 = 0, s2 = 0;
        for (int i = 0; i < n; ++i) {
          const uint8_t* px =
              src->rgb.data() + ((size_t)(y0 + i) * src->w + x) * 3;
          s0 += px[0] * k[i];
          s1 += px[1] * k[i];
          s2 += px[2] * k[i];
        }
        orow[x * 3 + 0] = clip8(s0);
        orow[x * 3 + 1] = clip8(s1);
        orow[x * 3 + 2] = clip8(s2);
      }
    }
  } else {
    *out = *src;
  }
}

// Shorter-side target dims, matching gmdx.data.transforms.resize_shorter_side
// (Python round() = banker's rounding = std::nearbyint in default FE mode).
void shorter_side_dims(int w, int h, int size, int* nw, int* nh) {
  if (w <= h) {
    *nw = size;
    *nh = std::max(1, (int)std::nearbyint((double)h * size / w));
  } else {
    *nh = size;
    *nw = std::max(1, (int)std::nearbyint((double)w * size / h));
  }
}

// decode -> shorter-side resize -> crop (top/left; -1 = center) -> optional
// hflip -> float32 CHW in [-1, 1].
bool preprocess_one(const uint8_t* data, int64_t len, int res, int64_t top,
                    int64_t left, int flip, float* out) {
  ImageU8 im;
  if (!decode_any(data, len, &im)) return false;
  int nw, nh;
  shorter_side_dims(im.w, im.h, res, &nw, &nh);
  ImageU8 resized;
  if (nw != im.w || nh != im.h) {
    resize_triangle(im, nw, nh, &resized);
  } else {
    resized = std::move(im);
  }
  if (top < 0) top = (nh - res) / 2;
  if (left < 0) left = (nw - res) / 2;
  if (top + res > nh || left + res > nw || top < 0 || left < 0) return false;
  const float inv = 2.0f / 255.0f;
  for (int c = 0; c < 3; ++c) {
    float* oc = out + (size_t)c * res * res;
    for (int y = 0; y < res; ++y) {
      const uint8_t* row =
          resized.rgb.data() + ((size_t)(top + y) * nw + left) * 3 + c;
      float* orow = oc + (size_t)y * res;
      if (flip) {
        for (int x = 0; x < res; ++x)
          orow[x] = row[(size_t)(res - 1 - x) * 3] * inv - 1.0f;
      } else {
        for (int x = 0; x < res; ++x) orow[x] = row[(size_t)x * 3] * inv - 1.0f;
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Dimensions without a full decode. Returns 0 on success.
int gmdx_image_probe(const uint8_t* data, int64_t len, int* w, int* h) {
  if (is_png(data, len)) {
    png_image img;
    memset(&img, 0, sizeof img);
    img.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&img, data, (size_t)len)) return -1;
    if (png_is_16bit(img)) {  // must take the PIL fallback (see decode_png)
      png_image_free(&img);
      return -1;
    }
    *w = (int)img.width;
    *h = (int)img.height;
    png_image_free(&img);
    return 0;
  }
  if (is_jpeg(data, len)) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_calc_output_dimensions(&cinfo);
    *w = (int)cinfo.output_width;
    *h = (int)cinfo.output_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  return -1;
}

// Full decode to RGB8 (h*w*3, row-major). `cap` guards the output buffer.
int gmdx_image_decode_rgb8(const uint8_t* data, int64_t len, uint8_t* out,
                           int64_t cap) {
  ImageU8 im;
  if (!decode_any(data, len, &im)) return -1;
  if ((int64_t)im.rgb.size() > cap) return -2;
  memcpy(out, im.rgb.data(), im.rgb.size());
  return 0;
}

// Batch decode+preprocess over a thread pool. `out` is (n, 3, res, res)
// float32 in [-1, 1]. tops/lefts are per-item crop offsets AFTER the
// shorter-side resize (-1 = center crop); flips are per-item 0/1.
// Returns 0 on success, i+1 if item i failed.
int gmdx_preprocess_batch(const uint8_t* const* datas, const int64_t* lens,
                          int n, int res, const int64_t* tops,
                          const int64_t* lefts, const uint8_t* flips,
                          float* out, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> fail(0);
  auto work = [&]() {
    for (int i; (i = next.fetch_add(1)) < n;) {
      if (fail.load(std::memory_order_relaxed)) return;
      bool ok = preprocess_one(
          datas[i], lens[i], res, tops ? tops[i] : -1, lefts ? lefts[i] : -1,
          flips ? (int)flips[i] : 0, out + (size_t)i * 3 * res * res);
      if (!ok) {
        int expected = 0;
        fail.compare_exchange_strong(expected, i + 1);
      }
    }
  };
  int nt = std::max(1, std::min(n_threads, n));
  if (nt == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(work);
    for (auto& th : pool) th.join();
  }
  return fail.load();
}

}  // extern "C"
