// Sanitizer self-test for the native runtime (SURVEY §5.2: the reference
// ships no sanitizer CI; our native C++ gets ASan/UBSan/TSan coverage).
//
// Build/run via `make selftest-asan` / `make selftest-tsan` in
// rtabmap_tpu/native (also exercised by tests/test_native.py).
//
// Usage: native_selftest [image.png ...]  — image args feed the threaded
// prefetch loader; codec fuzzing always runs.
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int64_t rvl_compress(const uint16_t* in, int64_t n, uint8_t* out);
int64_t rvl_decompress(const uint8_t* in, int64_t in_bytes, uint16_t* out,
                       int64_t n);
int64_t zlib_compress_bound(int64_t n);
int64_t zlib_compress2(const uint8_t* in, int64_t n, uint8_t* out,
                       int64_t out_cap, int level);
int64_t zlib_decompress(const uint8_t* in, int64_t n, uint8_t* out,
                        int64_t out_cap);
void* loader_create(const char** rgb_files, const char** depth_files,
                    int64_t n, int threads, int64_t max_pixels, int prefetch);
int loader_get(void* handle, int64_t index, uint8_t* gray_out, int* w, int* h,
               uint16_t* depth_out, int* dw, int* dh, int* depth_ok);
void loader_destroy(void* handle);
}

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);      \
      exit(1);                                                             \
    }                                                                      \
  } while (0)

static void test_rvl_roundtrip(std::mt19937& rng) {
  for (int trial = 0; trial < 50; ++trial) {
    int64_t n = 1 + (int64_t)(rng() % 4096);
    std::vector<uint16_t> depth(n);
    for (auto& d : depth) {
      uint32_t r = rng();
      d = (r % 4 == 0) ? 0 : (uint16_t)(r % 10000);  // zero runs + values
    }
    std::vector<uint8_t> comp(2 * n * 2 + 8);
    int64_t cb = rvl_compress(depth.data(), n, comp.data());
    CHECK(cb > 0 && cb <= (int64_t)comp.size());
    std::vector<uint16_t> back(n, 0xAAAA);
    CHECK(rvl_decompress(comp.data(), cb, back.data(), n) == n);
    CHECK(memcmp(depth.data(), back.data(), n * 2) == 0);
  }
}

static void test_rvl_corrupt(std::mt19937& rng) {
  int64_t n = 2048;
  std::vector<uint16_t> depth(n);
  for (auto& d : depth) d = (uint16_t)(rng() % 6000);
  std::vector<uint8_t> comp(2 * n * 2 + 8);
  int64_t cb = rvl_compress(depth.data(), n, comp.data());
  std::vector<uint16_t> back(n);
  // truncated streams must fail cleanly (no OOB reads under ASan)
  for (int64_t cut = 0; cut < cb; cut += 97)
    CHECK(rvl_decompress(comp.data(), cut, back.data(), n) <= n);
  // bit flips must never read past the buffer or overflow the output
  for (int trial = 0; trial < 200; ++trial) {
    std::vector<uint8_t> bad(comp.begin(), comp.begin() + cb);
    bad[rng() % cb] ^= (uint8_t)(1u << (rng() % 8));
    int64_t rc = rvl_decompress(bad.data(), cb, back.data(), n);
    CHECK(rc <= n);
  }
}

static void test_zlib(std::mt19937& rng) {
  std::vector<uint8_t> data(100000);
  for (auto& b : data) b = (uint8_t)(rng() % 7);  // compressible
  std::vector<uint8_t> comp(zlib_compress_bound(data.size()));
  int64_t cb = zlib_compress2(data.data(), data.size(), comp.data(),
                              comp.size(), 1);
  CHECK(cb > 0);
  std::vector<uint8_t> back(data.size());
  CHECK(zlib_decompress(comp.data(), cb, back.data(), back.size()) ==
        (int64_t)data.size());
  CHECK(back == data);
  comp[cb / 2] ^= 0xFF;  // corrupt -> clean error
  CHECK(zlib_decompress(comp.data(), cb, back.data(), back.size()) == -1);
}

// Thread-churn the prefetch loader: many create/consume/destroy cycles,
// including destruction with frames still in flight (TSan coverage of the
// worker/consumer handshake).
static void test_loader(const std::vector<std::string>& images) {
  std::vector<const char*> files;
  for (auto& s : images) files.push_back(s.c_str());
  for (int cycle = 0; cycle < 8; ++cycle) {
    void* L = loader_create(files.data(), nullptr, (int64_t)files.size(),
                            /*threads=*/3, /*max_pixels=*/1 << 22,
                            /*prefetch=*/2);
    std::vector<uint8_t> gray(1 << 22);
    std::vector<uint16_t> depth(1 << 22);
    int w, h, dw, dh, dok;
    // consume only half the frames, then destroy (in-flight teardown)
    int64_t take = (cycle % 2 == 0) ? (int64_t)files.size()
                                    : (int64_t)files.size() / 2;
    for (int64_t i = 0; i < take; ++i) {
      int rc = loader_get(L, i, gray.data(), &w, &h, depth.data(), &dw, &dh,
                          &dok);
      if (rc == 0) CHECK(w > 0 && h > 0);
    }
    loader_destroy(L);
  }
}

static void test_loader_missing_files() {
  const char* files[] = {"/nonexistent/a.png", "/nonexistent/b.jpg"};
  void* L = loader_create(files, nullptr, 2, 2, 1 << 20, 2);
  std::vector<uint8_t> gray(1 << 20);
  std::vector<uint16_t> depth(1 << 20);
  int w, h, dw, dh, dok;
  for (int64_t i = 0; i < 2; ++i)
    CHECK(loader_get(L, i, gray.data(), &w, &h, depth.data(), &dw, &dh,
                     &dok) != 0);
  loader_destroy(L);
}

int main(int argc, char** argv) {
  std::mt19937 rng(12345);
  test_rvl_roundtrip(rng);
  test_rvl_corrupt(rng);
  test_zlib(rng);
  test_loader_missing_files();
  if (argc > 1) {
    std::vector<std::string> images(argv + 1, argv + argc);
    test_loader(images);
  }
  printf("native_selftest OK\n");
  return 0;
}
