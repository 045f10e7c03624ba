// stereodata: native host-side data runtime for stereoanywhere_tpu.
//
// TPU-native equivalent of the reference's native data-path dependencies
// (SURVEY.md §2.6): OpenCV C++ image IO, numba @njit z-buffer warps
// (reference utils.py:89-117) and KITTI background infill (utils.py:227-270),
// and the C++ core of torch's DataLoader (the reference's only loading
// parallelism, train.py num_workers).
//
// Design: a pure C ABI (no Python.h) consumed via ctypes.  Every entry point
// is GIL-free by construction, so Python-side thread pools achieve real
// parallelism: the hot work (PNG/JPEG inflate, PFM parse, scalar warp loops)
// runs here while Python only assembles sample dicts.
//
// Decoders return malloc'd buffers the caller must release with sd_free.
// Error handling: functions return 0 on success, negative codes otherwise;
// sd_last_error() gives a thread-local message.

#include <cctype>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#include <jpeglib.h>
#include <png.h>

#include <csetjmp>

#define SD_API extern "C" __attribute__((visibility("default")))

static thread_local char g_err[512];

static int fail(int code, const char* fmt, ...) {
  va_list ap;
  va_start(ap, fmt);
  vsnprintf(g_err, sizeof(g_err), fmt, ap);
  va_end(ap);
  return code;
}

SD_API const char* sd_last_error() { return g_err; }
SD_API void sd_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// Decoded-image descriptor. dtype: 0=uint8, 1=uint16, 2=float32.
struct SDImage {
  void* data;
  int64_t h, w, c;
  int32_t dtype;
};

// ---------------------------------------------------------------------------
// PFM (reference frame_utils.py:33-68): "PF\n"/"Pf\n", dims, scale (sign =
// endianness), rows stored bottom-up.
SD_API int sd_read_pfm(const char* path, SDImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return fail(-1, "pfm open failed: %s", path);
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1 || magic[0] != 'P' ||
      (magic[1] != 'F' && magic[1] != 'f')) {
    fclose(f);
    return fail(-2, "not a PFM file: %s", path);
  }
  const int channels = magic[1] == 'F' ? 3 : 1;
  long w = 0, h = 0;
  double scale = 0;
  // skip comment lines between tokens
  int ch;
  auto skip_ws_comments = [&]() {
    for (;;) {
      ch = fgetc(f);
      if (ch == '#') {
        while (ch != '\n' && ch != EOF) ch = fgetc(f);
      } else if (!isspace(ch)) {
        ungetc(ch, f);
        return;
      }
    }
  };
  skip_ws_comments();
  if (fscanf(f, "%ld", &w) != 1) { fclose(f); return fail(-3, "pfm bad width: %s", path); }
  skip_ws_comments();
  if (fscanf(f, "%ld", &h) != 1) { fclose(f); return fail(-3, "pfm bad height: %s", path); }
  skip_ws_comments();
  if (fscanf(f, "%lf", &scale) != 1) { fclose(f); return fail(-3, "pfm bad scale: %s", path); }
  fgetc(f);  // single whitespace after the scale line
  if (w <= 0 || h <= 0 || w > 1 << 20 || h > 1 << 20) {
    fclose(f);
    return fail(-3, "pfm bad dims %ldx%ld: %s", w, h, path);
  }
  const size_t n = (size_t)w * h * channels;
  float* buf = (float*)malloc(n * sizeof(float));
  if (!buf) { fclose(f); return fail(-4, "pfm oom"); }
  // rows are bottom-up: read into place flipped
  for (long y = h - 1; y >= 0; --y) {
    if (fread(buf + (size_t)y * w * channels, sizeof(float), (size_t)w * channels, f) !=
        (size_t)w * channels) {
      free(buf);
      fclose(f);
      return fail(-5, "pfm truncated: %s", path);
    }
  }
  fclose(f);
  const bool file_le = scale < 0;
  const uint16_t one = 1;
  const bool host_le = *(const uint8_t*)&one == 1;
  if (file_le != host_le) {
    uint32_t* p = (uint32_t*)buf;
    for (size_t i = 0; i < n; ++i) p[i] = __builtin_bswap32(p[i]);
  }
  out->data = buf;
  out->h = h;
  out->w = w;
  out->c = channels;
  out->dtype = 2;
  return 0;
}

SD_API int sd_write_pfm(const char* path, const float* data, int64_t h, int64_t w,
                        int64_t c) {
  if (c != 1 && c != 3) return fail(-1, "pfm write: channels must be 1 or 3");
  FILE* f = fopen(path, "wb");
  if (!f) return fail(-1, "pfm write open failed: %s", path);
  fprintf(f, "%s\n%ld %ld\n-1.0\n", c == 3 ? "PF" : "Pf", (long)w, (long)h);
  for (long y = h - 1; y >= 0; --y)
    fwrite(data + (size_t)y * w * c, sizeof(float), (size_t)w * c, f);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG via libpng. Returns uint8 (8-bit) or uint16 (16-bit) with the file's
// channel count (palette/gray-alpha expanded; 16-bit network order swapped).
SD_API int sd_read_png(const char* path, SDImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return fail(-1, "png open failed: %s", path);
  png_byte sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) {
    fclose(f);
    return fail(-2, "not a PNG: %s", path);
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return fail(-3, "libpng init failed");
  }
  png_bytep* rows = nullptr;
  uint8_t* buf = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free(rows);
    free(buf);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return fail(-4, "png decode error: %s", path);
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // network order -> host LE
  png_read_update_info(png, info);

  const int channels = png_get_channels(png, info);
  const int depth = png_get_bit_depth(png, info);
  const size_t rowbytes = png_get_rowbytes(png, info);
  buf = (uint8_t*)malloc(rowbytes * h);
  rows = (png_bytep*)malloc(sizeof(png_bytep) * h);
  if (!buf || !rows) longjmp(png_jmpbuf(png), 1);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = buf + y * rowbytes;
  png_read_image(png, rows);
  png_read_end(png, nullptr);
  free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);

  out->data = buf;
  out->h = h;
  out->w = w;
  out->c = channels;
  out->dtype = depth == 16 ? 1 : 0;
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG via libjpeg -> uint8 RGB (or gray).
struct SDJpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void sd_jpeg_error_exit(j_common_ptr cinfo) {
  SDJpegErr* err = (SDJpegErr*)cinfo->err;
  char msg[JMSG_LENGTH_MAX];
  (*cinfo->err->format_message)(cinfo, msg);
  fail(-4, "jpeg decode error: %s", msg);
  longjmp(err->jb, 1);
}

SD_API int sd_read_jpeg(const char* path, SDImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return fail(-1, "jpeg open failed: %s", path);
  jpeg_decompress_struct cinfo;
  SDJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = sd_jpeg_error_exit;
  uint8_t* buf = nullptr;
  if (setjmp(jerr.jb)) {
    free(buf);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height, c = cinfo.output_components;
  buf = (uint8_t*)malloc((size_t)w * h * c);
  if (!buf) longjmp(jerr.jb, 1);
  while ((int)cinfo.output_scanline < h) {
    uint8_t* row = buf + (size_t)cinfo.output_scanline * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  out->data = buf;
  out->h = h;
  out->w = w;
  out->c = c;
  out->dtype = 0;
  return 0;
}

// ---------------------------------------------------------------------------
// Z-buffer forward splats (reference _fast_warp_depth/_fast_warp_disparity,
// utils.py:89-117). Scalar loops: the numpy ufunc.at equivalents are ~100x
// slower; these run at memory speed.
SD_API void sd_warp_depth(const float* depth, const float* disp, float* out, int64_t h,
                          int64_t w) {
  for (int64_t i = 0; i < h * w; ++i) out[i] = INFINITY;
  for (int64_t y = 0; y < h; ++y) {
    const float* dz = depth + y * w;
    const float* dd = disp + y * w;
    float* o = out + y * w;
    for (int64_t x = 0; x < w; ++x) {
      if (dz[x] <= 0) continue;
      const int64_t tx = (int64_t)llroundf((float)x - dd[x]);
      if (tx < 0 || tx >= w) continue;
      if (dz[x] < o[tx]) o[tx] = dz[x];
    }
  }
  for (int64_t i = 0; i < h * w; ++i)
    if (!std::isfinite(out[i])) out[i] = 0;
}

SD_API void sd_warp_disparity(const float* disp, float* out, int64_t h, int64_t w) {
  memset(out, 0, sizeof(float) * h * w);
  for (int64_t y = 0; y < h; ++y) {
    const float* dd = disp + y * w;
    float* o = out + y * w;
    for (int64_t x = 0; x < w; ++x) {
      if (dd[x] <= 0) continue;
      const int64_t tx = (int64_t)llroundf((float)x - dd[x]);
      if (tx < 0 || tx >= w) continue;
      if (dd[x] > o[tx]) o[tx] = dd[x];
    }
  }
}

// KITTI-style background infill (reference _interpolate_background,
// utils.py:227-270): hole row-spans take min(left,right) neighbor; one-sided
// spans copy the single neighbor.
SD_API void sd_interpolate_background(float* d, int64_t h, int64_t w) {
  for (int64_t y = 0; y < h; ++y) {
    float* row = d + y * w;
    int64_t prev = -1;
    for (int64_t x = 0; x <= w; ++x) {
      const bool valid = x < w && row[x] > 0;
      if (valid) {
        if (prev >= 0 && x > prev + 1) {
          const float v = row[prev] < row[x] ? row[prev] : row[x];
          for (int64_t k = prev + 1; k < x; ++k) row[k] = v;
        } else if (prev < 0 && x > 0) {
          for (int64_t k = 0; k < x; ++k) row[k] = row[x];  // right-only span
        }
        prev = x;
      } else if (x == w && prev >= 0 && prev < w - 1) {
        for (int64_t k = prev + 1; k < w; ++k) row[k] = row[prev];  // left-only span
      }
    }
  }
}

// Otsu threshold over a uint8 image (reference NonLambertianProcessor's
// cv2.threshold(..., THRESH_OTSU), non_lambertian.py:34-43). Returns the
// threshold; mask_out (optional) gets 255 where value > threshold.
SD_API int sd_otsu_threshold(const uint8_t* img, int64_t n, uint8_t* mask_out) {
  int64_t hist[256] = {0};
  for (int64_t i = 0; i < n; ++i) hist[img[i]]++;
  double total_sum = 0;
  for (int v = 0; v < 256; ++v) total_sum += (double)v * hist[v];
  double sum_b = 0;
  int64_t w_b = 0;
  double best_var = -1;
  int best_t = 0;
  for (int t = 0; t < 256; ++t) {
    w_b += hist[t];
    if (w_b == 0) continue;
    const int64_t w_f = n - w_b;
    if (w_f == 0) break;
    sum_b += (double)t * hist[t];
    const double m_b = sum_b / w_b;
    const double m_f = (total_sum - sum_b) / w_f;
    const double var = (double)w_b * w_f * (m_b - m_f) * (m_b - m_f);
    if (var > best_var) {
      best_var = var;
      best_t = t;
    }
  }
  if (mask_out)
    for (int64_t i = 0; i < n; ++i) mask_out[i] = img[i] > best_t ? 255 : 0;
  return best_t;
}

SD_API int sd_version() { return 1; }
