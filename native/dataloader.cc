// Native image decode + resample for the data pipeline.
//
// The reference's loader is PIL-in-Python (data/segm_attr_dataset.py:78-115);
// at DeepFashion-MultiModal scale (44k 1024x512 images, README.md:238-243)
// Python-side JPEG decode + Lanczos resample is the input-pipeline
// bottleneck.  This library does decode (libjpeg/libpng, sniffed by magic
// bytes) and separable Lanczos-3 / nearest resampling in C++, exposed over a
// plain C ABI for ctypes (no pybind11 in this image).  All entry points
// release the GIL implicitly (pure C calls), so the Python-side prefetch
// threads in data/loader.py decode truly in parallel; t2h_decode_batch also
// offers an internal std::thread pool.
//
// Resampling matches PIL semantics: Lanczos-3 with filter support scaled by
// the downsampling factor (PIL's antialias behaviour) and half-pixel centers;
// nearest uses PIL's floor((dst + 0.5) * scale) source pick.  Numeric
// agreement with PIL is asserted in tests/test_native_loader.py.
//
// Build: g++ -O3 -shared -fPIC dataloader.cc -o libt2hdata.so -ljpeg -lpng
// (done on demand by text2human_tpu/data/native_loader.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, row-major
};

// ---------------------------------------------------------------------------
// decode
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->h) * out->w * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) {
    // PIL parity: np.array(Image.open(p)) on a P-mode PNG yields the raw
    // palette INDICES [H, W], not expanded RGB — segmentation maps are
    // commonly stored this way, so expanding here would corrupt class ids.
    if (bit_depth < 8) png_set_packing(png);
  } else {
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  }
  png_read_update_info(png, info);

  out->h = int(h);
  out->w = int(w);
  out->c = int(png_get_channels(png, info));
  out->data.resize(size_t(out->h) * out->w * out->c);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->c;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' && magic[3] == 'G') {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// Header-only geometry probe (no pixel decode).
bool probe_file(const char* path, int* h, int* w, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (!setjmp(jerr.jb)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *h = cinfo.image_height;
      *w = cinfo.image_width;
      *c = cinfo.num_components;
      ok = true;
    }
    jpeg_destroy_decompress(&cinfo);
  } else if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' && magic[3] == 'G') {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (png && info && !setjmp(png_jmpbuf(png))) {
      png_init_io(png, f);
      png_read_info(png, info);
      png_uint_32 pw, ph;
      int bit_depth, color_type;
      png_get_IHDR(png, info, &pw, &ph, &bit_depth, &color_type, nullptr, nullptr, nullptr);
      *h = int(ph);
      *w = int(pw);
      // palette PNGs decode to raw indices (PIL parity), i.e. 1 channel
      *c = png_get_channels(png, info);
      ok = true;
    }
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// resample
// ---------------------------------------------------------------------------

inline double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

// Precomputed per-output-pixel kernel (PIL ImagingResampleHorizontal logic).
struct Kernel {
  std::vector<int> start;          // first source index per output pixel
  std::vector<int> size;           // taps per output pixel
  std::vector<double> coeffs;      // [out, max_size] row-major
  int max_size = 0;
};

Kernel build_kernel(int in_size, int out_size) {
  Kernel k;
  double scale = double(in_size) / out_size;
  double support = 3.0 * std::max(scale, 1.0);  // antialias when downscaling
  double inv_filterscale = 1.0 / std::max(scale, 1.0);
  k.max_size = int(std::ceil(support)) * 2 + 1;
  k.start.resize(out_size);
  k.size.resize(out_size);
  k.coeffs.assign(size_t(out_size) * k.max_size, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double wsum = 0.0;
    int n = xmax - xmin;
    double* row = &k.coeffs[size_t(xx) * k.max_size];
    for (int i = 0; i < n; ++i) {
      double wgt = lanczos3((xmin + i - center + 0.5) * inv_filterscale);
      row[i] = wgt;
      wsum += wgt;
    }
    if (wsum != 0.0)
      for (int i = 0; i < n; ++i) row[i] /= wsum;
    k.start[xx] = xmin;
    k.size[xx] = n;
  }
  return k;
}

inline uint8_t clip8(double v) {
  long r = std::lround(v);
  return uint8_t(std::min(255L, std::max(0L, r)));
}

void resize_lanczos(const Image& src, int out_h, int out_w, uint8_t* out) {
  Kernel kh = build_kernel(src.w, out_w);
  Kernel kv = build_kernel(src.h, out_h);
  int c = src.c;
  // horizontal pass into a float intermediate
  std::vector<float> tmp(size_t(src.h) * out_w * c);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* srow = src.data.data() + size_t(y) * src.w * c;
    float* trow = tmp.data() + size_t(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      const double* co = &kh.coeffs[size_t(x) * kh.max_size];
      int s0 = kh.start[x], n = kh.size[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int i = 0; i < n; ++i) acc += srow[(s0 + i) * c + ch] * float(co[i]);
        trow[x * c + ch] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; ++y) {
    const double* co = &kv.coeffs[size_t(y) * kv.max_size];
    int s0 = kv.start[y], n = kv.size[y];
    uint8_t* orow = out + size_t(y) * out_w * c;
    for (int x = 0; x < out_w * c; ++x) {
      float acc = 0.0f;
      for (int i = 0; i < n; ++i) acc += tmp[size_t(s0 + i) * out_w * c + x] * float(co[i]);
      orow[x] = clip8(acc);
    }
  }
}

void resize_nearest(const Image& src, int out_h, int out_w, uint8_t* out) {
  int c = src.c;
  double sy = double(src.h) / out_h, sx = double(src.w) / out_w;
  for (int y = 0; y < out_h; ++y) {
    int ys = std::min(src.h - 1, int((y + 0.5) * sy));
    const uint8_t* srow = src.data.data() + size_t(ys) * src.w * c;
    uint8_t* orow = out + size_t(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      int xs = std::min(src.w - 1, int((x + 0.5) * sx));
      std::memcpy(orow + size_t(x) * c, srow + size_t(xs) * c, c);
    }
  }
}

// Keep a single channel of a decoded image (densepose IUV: the datasets
// consume only channel 2, the I plane — segm_attr_dataset.py:102,153).
// Selecting before the resample does 1/3 the filter work and avoids the
// post-hoc strided copy the Python slice would make.
void select_channel(Image* img, int channel) {
  if (img->c <= 1 || channel < 0 || channel >= img->c) return;
  Image mono;
  mono.h = img->h;
  mono.w = img->w;
  mono.c = 1;
  mono.data.resize(size_t(img->h) * img->w);
  const uint8_t* src = img->data.data() + channel;
  for (size_t i = 0; i < mono.data.size(); ++i) mono.data[i] = src[i * img->c];
  *img = std::move(mono);
}

int decode_one(const char* path, uint8_t* out, int out_h, int out_w,
               int channels, int filter, int channel = -1) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  if (channel >= 0) {
    if (channel >= img.c) return 3;  // channel out of range
    select_channel(&img, channel);
  }
  if (img.c != channels) {
    if (img.c == 1 && channels == 3) {  // gray -> RGB
      Image rgb;
      rgb.h = img.h; rgb.w = img.w; rgb.c = 3;
      rgb.data.resize(size_t(img.h) * img.w * 3);
      for (size_t i = 0; i < img.data.size(); ++i) {
        rgb.data[i * 3] = rgb.data[i * 3 + 1] = rgb.data[i * 3 + 2] = img.data[i];
      }
      img = std::move(rgb);
    } else if (img.c == 4 && channels == 3) {  // drop alpha
      Image rgb;
      rgb.h = img.h; rgb.w = img.w; rgb.c = 3;
      rgb.data.resize(size_t(img.h) * img.w * 3);
      for (size_t i = 0; i < size_t(img.h) * img.w; ++i)
        std::memcpy(&rgb.data[i * 3], &img.data[i * 4], 3);
      img = std::move(rgb);
    } else {
      return 2;  // channel mismatch the caller must handle
    }
  }
  if (out_h == img.h && out_w == img.w) {
    std::memcpy(out, img.data.data(), img.data.size());
  } else if (filter == 0) {
    resize_nearest(img, out_h, out_w, out);
  } else {
    resize_lanczos(img, out_h, out_w, out);
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success; fills h/w/c with the on-disk geometry.  Reads only
// the file header — no pixel decode.
int t2h_image_size(const char* path, int* h, int* w, int* c) {
  return probe_file(path, h, w, c) ? 0 : 1;
}

// Decode `path` into `out` (uint8 HWC, out_h*out_w*channels bytes), resampled
// with filter 0=nearest (masks) or 1=lanczos3 (RGB).  Returns 0 on success.
int t2h_decode_image(const char* path, uint8_t* out, int out_h, int out_w,
                     int channels, int filter) {
  return decode_one(path, out, out_h, out_w, channels, filter);
}

// Decode one channel of `path` into `out` (uint8 [out_h, out_w]): the
// densepose-IUV fast path (channel 2 = I plane).  Returns 0 on success,
// 3 if the image has no such channel.
int t2h_decode_channel(const char* path, uint8_t* out, int out_h, int out_w,
                       int channel, int filter) {
  return decode_one(path, out, out_h, out_w, 1, filter, channel);
}

// Threaded batch decode: n images into one [n, out_h, out_w, channels]
// buffer.  Returns the number of failures (0 = all good).
int t2h_decode_batch(const char** paths, int n, uint8_t* out, int out_h,
                     int out_w, int channels, int filter, int num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, n));
  std::atomic<int> next(0), failures(0);
  size_t stride = size_t(out_h) * out_w * channels;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_one(paths[i], out + stride * i, out_h, out_w, channels,
                     filter) != 0)
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // extern "C"
