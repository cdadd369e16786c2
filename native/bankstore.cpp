// bankstore — native template-bank storage and batch server.
//
// The TPU-native replacement for the reference's data layer: cPickle block
// files written one object at a time (ref: gw_template_maker.py:842-863)
// and re-loaded wholesale into host memory before training
// (ref: bbhMahoGANy.py:969-1005). Here a bank is a single checksummed,
// memory-mapped binary file:
//
//   header (64 B): magic 'GNTB' | version | n | n_pix | n_par | crc32(data)
//   templates: float32 [n, n_pix]
//   params:    float32 [n, n_par]
//
// - writes stream through a multi-threaded chunked path with a final fsync
// - opens are O(1) via mmap (zero-copy numpy views on the Python side)
// - gather() serves shuffled minibatches with a thread pool, for banks too
//   large to keep device-resident
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x42544e47;  // 'GNTB' little-endian
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t n;
  uint32_t n_pix;
  uint32_t n_par;
  uint32_t crc32;
  uint32_t reserved[9];
};
static_assert(sizeof(Header) == 64, "header must be 64 bytes");

// CRC32 (IEEE, table-driven), parallel-friendly via chunk combine-free
// design: we CRC chunks independently and XOR-fold them with their offsets —
// order-independent integrity check (not a standard CRC of the stream, but a
// deterministic whole-file checksum with the same error-detection strength
// for our purpose).
uint32_t crc32_table[256];
struct CrcInit {
  CrcInit() {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      crc32_table[i] = c;
    }
  }
} crc_init;

uint32_t crc32_chunk(const uint8_t* p, size_t len) {
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; i++) c = crc32_table[(c ^ p[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

uint32_t parallel_checksum(const uint8_t* data, size_t len, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  size_t chunk = (len + n_threads - 1) / n_threads;
  std::vector<uint32_t> partial(n_threads, 0);
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) {
    pool.emplace_back([&, t] {
      size_t lo = t * chunk;
      if (lo >= len) return;
      size_t hi = lo + chunk < len ? lo + chunk : len;
      // fold the chunk index in so reordered chunks are detected
      partial[t] = crc32_chunk(data + lo, hi - lo) ^ (0x9E3779B9u * (uint32_t)(t + 1));
    });
  }
  for (auto& th : pool) th.join();
  uint32_t out = 0;
  for (uint32_t p : partial) out ^= p;
  return out;
}

struct Handle {
  int fd = -1;
  void* map = nullptr;
  size_t map_len = 0;
  Header hdr{};
};

size_t data_len(const Header& h) {
  return (size_t)h.n * h.n_pix * 4 + (size_t)h.n * h.n_par * 4;
}

}  // namespace

extern "C" {

// Write a bank file. Returns 0 on success, negative errno-style code.
int gntb_write(const char* path, const float* templates, uint64_t n,
               uint32_t n_pix, const float* params, uint32_t n_par,
               int n_threads) {
  Header h{};
  h.magic = kMagic;
  h.version = kVersion;
  h.n = n;
  h.n_pix = n_pix;
  h.n_par = n_par;

  size_t t_bytes = (size_t)n * n_pix * 4;
  size_t p_bytes = (size_t)n * n_par * 4;

  int fd = ::open(path, O_CREAT | O_TRUNC | O_RDWR, 0644);
  if (fd < 0) return -1;
  size_t total = sizeof(Header) + t_bytes + p_bytes;
  if (::ftruncate(fd, (off_t)total) != 0) {
    ::close(fd);
    return -2;
  }
  void* map = ::mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return -3;
  }
  uint8_t* base = (uint8_t*)map;

  // parallel copy of the two payload sections
  auto copy_mt = [&](uint8_t* dst, const uint8_t* src, size_t len) {
    int nt = n_threads < 1 ? 1 : n_threads;
    size_t chunk = (len + nt - 1) / nt;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; t++) {
      pool.emplace_back([=] {
        size_t lo = (size_t)t * chunk;
        if (lo >= len) return;
        size_t hi = lo + chunk < len ? lo + chunk : len;
        std::memcpy(dst + lo, src + lo, hi - lo);
      });
    }
    for (auto& th : pool) th.join();
  };
  copy_mt(base + sizeof(Header), (const uint8_t*)templates, t_bytes);
  if (p_bytes) copy_mt(base + sizeof(Header) + t_bytes, (const uint8_t*)params, p_bytes);

  h.crc32 = parallel_checksum(base + sizeof(Header), t_bytes + p_bytes,
                              n_threads < 1 ? 1 : n_threads);
  std::memcpy(base, &h, sizeof(Header));

  ::msync(map, total, MS_SYNC);
  ::munmap(map, total);
  ::fsync(fd);
  ::close(fd);
  return 0;
}

// Open a bank (mmap, read-only). verify != 0 → checksum the payload.
// Returns an opaque handle pointer or nullptr.
void* gntb_open(const char* path, int verify, int n_threads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st{};
  if (::fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* map = ::mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  Header h{};
  std::memcpy(&h, map, sizeof(Header));
  if (h.magic != kMagic || h.version != kVersion ||
      sizeof(Header) + data_len(h) > (size_t)st.st_size) {
    ::munmap(map, (size_t)st.st_size);
    ::close(fd);
    return nullptr;
  }
  if (verify) {
    uint32_t crc = parallel_checksum((const uint8_t*)map + sizeof(Header),
                                     data_len(h), n_threads < 1 ? 1 : n_threads);
    if (crc != h.crc32) {
      ::munmap(map, (size_t)st.st_size);
      ::close(fd);
      return nullptr;
    }
  }
  auto* hd = new Handle();
  hd->fd = fd;
  hd->map = map;
  hd->map_len = (size_t)st.st_size;
  hd->hdr = h;
  return hd;
}

uint64_t gntb_n(void* handle) { return ((Handle*)handle)->hdr.n; }
uint32_t gntb_n_pix(void* handle) { return ((Handle*)handle)->hdr.n_pix; }
uint32_t gntb_n_par(void* handle) { return ((Handle*)handle)->hdr.n_par; }

const float* gntb_templates(void* handle) {
  auto* h = (Handle*)handle;
  return (const float*)((const uint8_t*)h->map + sizeof(Header));
}

const float* gntb_params(void* handle) {
  auto* h = (Handle*)handle;
  return (const float*)((const uint8_t*)h->map + sizeof(Header) +
                        (size_t)h->hdr.n * h->hdr.n_pix * 4);
}

// Gather rows idx[0..count) of templates (+params) into contiguous output
// buffers with a thread pool — the batch server for host-resident banks.
int gntb_gather(void* handle, const uint64_t* idx, uint64_t count,
                float* out_templates, float* out_params, int n_threads) {
  auto* h = (Handle*)handle;
  const float* t = gntb_templates(handle);
  const float* p = gntb_params(handle);
  uint32_t n_pix = h->hdr.n_pix, n_par = h->hdr.n_par;
  uint64_t n = h->hdr.n;
  std::atomic<int> bad{0};

  int nt = n_threads < 1 ? 1 : n_threads;
  uint64_t chunk = (count + nt - 1) / nt;
  std::vector<std::thread> pool;
  for (int th = 0; th < nt; th++) {
    pool.emplace_back([=, &bad] {
      uint64_t lo = th * chunk;
      if (lo >= count) return;
      uint64_t hi = lo + chunk < count ? lo + chunk : count;
      for (uint64_t i = lo; i < hi; i++) {
        uint64_t row = idx[i];
        if (row >= n) {
          bad.store(1);
          return;
        }
        std::memcpy(out_templates + i * n_pix, t + row * n_pix, n_pix * 4);
        if (out_params && n_par)
          std::memcpy(out_params + i * n_par, p + row * n_par, n_par * 4);
      }
    });
  }
  for (auto& th : pool) th.join();
  return bad.load() ? -1 : 0;
}

void gntb_close(void* handle) {
  auto* h = (Handle*)handle;
  if (h->map) ::munmap(h->map, h->map_len);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
