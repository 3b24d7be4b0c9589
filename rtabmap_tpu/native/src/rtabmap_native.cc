// Native runtime components for rtabmap_tpu (C ABI, loaded via ctypes).
//
// Capability parity with the reference's native data plane:
//  - RVL depth codec (reference: corelib/src/rvl_codec.cpp implements the
//    Wilson 2017 "Fast Lossless Depth Image Compression" scheme; this is a
//    fresh implementation of that published algorithm: zero-run / value-run
//    alternation with zigzag deltas in 4-bit variable-length chunks).
//  - zlib blob compression (reference: Compression.cpp compressData2).
//  - JPEG / 16-bit PNG decode (reference: compressImage2/uncompressImage
//    via OpenCV imencode/imdecode).
//  - A multi-threaded prefetching frame loader (reference:
//    SensorCaptureThread + CameraImages: files are read and decoded on
//    worker threads ahead of the consumer).
//
// Build: make -C rtabmap_tpu/native   (outputs librtabmap_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

extern "C" {

// ------------------------------------------------------------------ RVL codec

// 4-bit variable-length unsigned int: low 3 bits payload, high bit = more.
struct NibbleWriter {
  uint8_t* buf;
  size_t pos = 0;   // nibble index
  void put(uint32_t v) {
    do {
      uint8_t nib = v & 0x7;
      v >>= 3;
      if (v) nib |= 0x8;
      if (pos & 1)
        buf[pos >> 1] |= nib;
      else
        buf[pos >> 1] = (uint8_t)(nib << 4);
      ++pos;
    } while (v);
  }
  size_t bytes() const { return (pos + 1) / 2; }
};

struct NibbleReader {
  const uint8_t* buf;
  size_t end;       // total nibbles available
  size_t pos = 0;
  bool overrun = false;
  uint32_t get() {
    uint32_t v = 0;
    int shift = 0;
    uint8_t nib;
    do {
      if (pos >= end || shift > 31) {  // corrupt/truncated stream
        overrun = true;
        return 0;
      }
      nib = (pos & 1) ? (buf[pos >> 1] & 0xF) : (buf[pos >> 1] >> 4);
      ++pos;
      v |= (uint32_t)(nib & 0x7) << shift;
      shift += 3;
    } while (nib & 0x8);
    return v;
  }
};

static inline uint32_t zigzag(int32_t d) {
  return ((uint32_t)d << 1) ^ (uint32_t)(d >> 31);
}
static inline int32_t unzigzag(uint32_t z) { return (int32_t)(z >> 1) ^ -(int32_t)(z & 1); }

// Returns compressed byte size (buffer must hold >= 2*n*2+8 bytes).
int64_t rvl_compress(const uint16_t* in, int64_t n, uint8_t* out) {
  NibbleWriter w{out};
  int64_t i = 0;
  uint16_t prev = 0;
  while (i < n) {
    int64_t zeros = 0;
    while (i < n && in[i] == 0) { ++zeros; ++i; }
    int64_t start = i;
    while (i < n && in[i] != 0) ++i;
    int64_t nonzeros = i - start;
    w.put((uint32_t)zeros);
    w.put((uint32_t)nonzeros);
    for (int64_t k = start; k < start + nonzeros; ++k) {
      w.put(zigzag((int32_t)in[k] - (int32_t)prev));
      prev = in[k];
    }
  }
  return (int64_t)w.bytes();
}

int64_t rvl_decompress(const uint8_t* in, int64_t in_bytes, uint16_t* out,
                       int64_t n) {
  NibbleReader r{in, (size_t)in_bytes * 2};
  int64_t i = 0;
  uint16_t prev = 0;
  while (i < n) {
    uint32_t zeros = r.get();
    uint32_t nonzeros = r.get();
    if (r.overrun || i + (int64_t)zeros + (int64_t)nonzeros > n) return -1;
    for (uint32_t k = 0; k < zeros; ++k) out[i++] = 0;
    for (uint32_t k = 0; k < nonzeros; ++k) {
      prev = (uint16_t)((int32_t)prev + unzigzag(r.get()));
      out[i++] = prev;
    }
    if (r.overrun) return -1;
  }
  return i;
}

// ---------------------------------------------------------------------- zlib

int64_t zlib_compress_bound(int64_t n) { return (int64_t)compressBound((uLong)n); }

int64_t zlib_compress2(const uint8_t* in, int64_t n, uint8_t* out,
                       int64_t out_cap, int level) {
  uLongf out_len = (uLongf)out_cap;
  if (compress2(out, &out_len, in, (uLong)n, level) != Z_OK) return -1;
  return (int64_t)out_len;
}

int64_t zlib_decompress(const uint8_t* in, int64_t n, uint8_t* out,
                        int64_t out_cap) {
  uLongf out_len = (uLongf)out_cap;
  if (uncompress(out, &out_len, in, (uLong)n) != Z_OK) return -1;
  return (int64_t)out_len;
}

// ---------------------------------------------------------------- JPEG decode

// Decode to 8-bit grayscale. Returns 0 on success; fills w/h.
int jpeg_decode_gray(const uint8_t* buf, int64_t len, uint8_t* out,
                     int64_t out_cap, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  if ((int64_t)(*w) * (*h) > out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (int64_t)cinfo.output_scanline * (*w);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------- PNG decode

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t off;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* ctx = (PngReadCtx*)png_get_io_ptr(png);
  if (ctx->off + n > ctx->len) {
    png_error(png, "eof");
    return;
  }
  memcpy(out, ctx->data + ctx->off, n);
  ctx->off += n;
}

// Decode PNG to 16-bit single channel (depth). Returns 0 on success.
int png_decode_gray16(const uint8_t* buf, int64_t len, uint16_t* out,
                      int64_t out_cap, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngReadCtx ctx{buf, (size_t)len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color != PNG_COLOR_TYPE_GRAY) png_set_rgb_to_gray(png, 1, -1, -1);
  if (depth < 16) png_set_expand_16(png);
  png_read_update_info(png, info);
  if ((int64_t)(*w) * (*h) > out_cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = (png_bytep)(out + (int64_t)y * (*w));
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  // png is big-endian; swap to host little-endian
  int64_t npx = (int64_t)(*w) * (*h);
  for (int64_t i = 0; i < npx; ++i) out[i] = (uint16_t)((out[i] >> 8) | (out[i] << 8));
  return 0;
}

// Decode PNG to 8-bit grayscale.
int png_decode_gray8(const uint8_t* buf, int64_t len, uint8_t* out,
                     int64_t out_cap, int* w, int* h) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return -1; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngReadCtx ctx{buf, (size_t)len, 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);
  if (color & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  if ((int64_t)(*w) * (*h) > out_cap) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out + (int64_t)y * (*w);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

}  // extern "C"  (loader below uses C++ containers; C linkage reopened after)

// -------------------------------------------------------- prefetching loader

#include <map>

struct LoadedFrame {
  int64_t index = -1;
  int w = 0, h = 0;
  int dw = 0, dh = 0;
  std::vector<uint8_t> gray;    // 8-bit
  std::vector<uint16_t> depth;  // 16-bit (may be empty)
  int status = 0;
};

namespace {

struct LoaderImpl {
  std::vector<std::string> rgb_files;
  std::vector<std::string> depth_files;
  size_t max_pixels;
  std::atomic<int64_t> next_index{0};
  std::mutex mu;
  std::condition_variable cv;
  std::map<int64_t, LoadedFrame> ready;
  size_t prefetch;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  int64_t consumed = 0;

  static std::vector<uint8_t> read_file(const std::string& path) {
    std::vector<uint8_t> out;
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return out;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    out.resize(n);
    if (fread(out.data(), 1, n, f) != (size_t)n) out.clear();
    fclose(f);
    return out;
  }

  void work() {
    while (!stop.load()) {
      int64_t idx = next_index.fetch_add(1);
      if (idx >= (int64_t)rgb_files.size()) return;
      LoadedFrame fr;
      fr.index = idx;
      auto buf = read_file(rgb_files[idx]);
      fr.gray.resize(max_pixels);
      int rc = -1;
      if (buf.size() > 3 && buf[0] == 0xFF && buf[1] == 0xD8)
        rc = jpeg_decode_gray(buf.data(), buf.size(), fr.gray.data(), max_pixels,
                              &fr.w, &fr.h);
      else if (buf.size() > 8)
        rc = png_decode_gray8(buf.data(), buf.size(), fr.gray.data(), max_pixels,
                              &fr.w, &fr.h);
      fr.status = rc;
      if (rc == 0) fr.gray.resize((size_t)fr.w * fr.h);
      if (idx < (int64_t)depth_files.size() && !depth_files[idx].empty()) {
        auto dbuf = read_file(depth_files[idx]);
        fr.depth.resize(max_pixels);
        int rc2 = png_decode_gray16(dbuf.data(), dbuf.size(), fr.depth.data(),
                                    max_pixels, &fr.dw, &fr.dh);
        if (rc2 == 0)
          fr.depth.resize((size_t)fr.dw * fr.dh);
        else
          fr.depth.clear();
      }
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] { return stop.load() || ready.size() < prefetch ||
                               idx < consumed + (int64_t)prefetch; });
      if (stop.load()) return;
      ready.emplace(idx, std::move(fr));
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** rgb_files, const char** depth_files, int64_t n,
                    int threads, int64_t max_pixels, int prefetch) {
  auto* L = new LoaderImpl();
  L->rgb_files.assign(rgb_files, rgb_files + n);
  if (depth_files) {
    L->depth_files.assign(depth_files, depth_files + n);
  }
  L->max_pixels = (size_t)max_pixels;
  L->prefetch = (size_t)prefetch;
  for (int t = 0; t < threads; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Blocks until frame `index` is decoded; copies into out buffers.
// Returns decode status (0 ok), fills dims. depth_ok=1 when depth present.
int loader_get(void* handle, int64_t index, uint8_t* gray_out, int* w, int* h,
               uint16_t* depth_out, int* dw, int* dh, int* depth_ok) {
  auto* L = (LoaderImpl*)handle;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv.wait(lk, [&] { return L->ready.count(index) > 0; });
  LoadedFrame fr = std::move(L->ready[index]);
  L->ready.erase(index);
  L->consumed = index + 1;
  L->cv.notify_all();
  lk.unlock();
  *w = fr.w;
  *h = fr.h;
  if (fr.status == 0) memcpy(gray_out, fr.gray.data(), fr.gray.size());
  *depth_ok = fr.depth.empty() ? 0 : 1;
  *dw = fr.dw;
  *dh = fr.dh;
  if (!fr.depth.empty())
    memcpy(depth_out, fr.depth.data(), fr.depth.size() * 2);
  return fr.status;
}

void loader_destroy(void* handle) {
  auto* L = (LoaderImpl*)handle;
  L->stop.store(true);
  L->cv.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
