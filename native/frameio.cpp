// Native frame IO: mmap-backed .npy video reader with a prefetching
// ring buffer and fused uint8 -> float32 normalization.
//
// Role: the host-side data loader for long-video streaming (the
// reference has no loader at all — ComfyUI hands it an in-memory tensor;
// at 1080p x 1000 frames that is 6+ GB, so the TPU build streams).
// The hot loop (byte -> float multiply) vectorizes under -O3; the
// prefetch thread hides page-in latency behind device compute.
//
// C ABI (used via ctypes from utils/frameio.py):
//   fio_open(path)                     -> handle (parses the npy header)
//   fio_info(handle, dims[4], &dtype)  -> shape [T, H, W, C], dtype code
//   fio_fetch_f32(handle, start, count, out)
//       copies frames [start, start+count) as float32 scaled to [0, 1]
//       (uint8 input) or verbatim (float32 input); clamps at T by
//       repeating the last frame (pipeline padding semantics).
//   fio_prefetch(handle, start, count) -> async page-in hint
//   fio_close(handle)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Video {
  int fd = -1;
  const uint8_t *map = nullptr;
  size_t map_len = 0;
  size_t data_off = 0;
  int64_t dims[4] = {0, 0, 0, 0};  // T, H, W, C
  int dtype = 0;                   // 0 = uint8, 1 = float32
  size_t frame_bytes = 0;
  std::thread prefetcher;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> want_start{-1};
  std::atomic<int64_t> want_count{0};
};

std::mutex g_lock;
std::vector<Video *> g_videos;

// minimal .npy v1/v2 header parser for C-contiguous arrays
bool parse_npy(const uint8_t *p, size_t len, Video *v) {
  if (len < 10 || memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, off;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    off = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) | ((size_t)p[11] << 24);
    off = 12;
  }
  std::string hdr((const char *)p + off, hlen);
  if (hdr.find("'fortran_order': False") == std::string::npos) return false;
  if (hdr.find("'<f4'") != std::string::npos || hdr.find("'|f4'") != std::string::npos)
    v->dtype = 1;
  else if (hdr.find("'|u1'") != std::string::npos || hdr.find("'<u1'") != std::string::npos)
    v->dtype = 0;
  else
    return false;
  size_t sp = hdr.find("'shape': (");
  if (sp == std::string::npos) return false;
  sp += 10;
  int nd = 0;
  while (nd < 4) {
    size_t end;
    long val = std::stol(hdr.substr(sp), &end);
    v->dims[nd++] = val;
    sp += end;
    while (sp < hdr.size() && (hdr[sp] == ',' || hdr[sp] == ' ')) sp++;
    if (sp >= hdr.size() || hdr[sp] == ')') break;
  }
  if (nd != 4) return false;
  v->data_off = off + hlen;
  size_t elt = v->dtype == 1 ? 4 : 1;
  v->frame_bytes = (size_t)v->dims[1] * v->dims[2] * v->dims[3] * elt;
  return v->data_off + (size_t)v->dims[0] * v->frame_bytes <= len;
}

void prefetch_loop(Video *v) {
  int64_t done_start = -1, done_count = 0;
  while (!v->stop.load(std::memory_order_relaxed)) {
    int64_t s = v->want_start.load(std::memory_order_relaxed);
    int64_t c = v->want_count.load(std::memory_order_relaxed);
    if (s >= 0 && (s != done_start || c != done_count)) {
      int64_t t = v->dims[0];
      int64_t e = std::min<int64_t>(s + c, t);
      s = std::min<int64_t>(std::max<int64_t>(s, 0), t);
      if (e > s) {
        const uint8_t *base = v->map + v->data_off + (size_t)s * v->frame_bytes;
        size_t span = (size_t)(e - s) * v->frame_bytes;
        madvise((void *)base, span, MADV_WILLNEED);
        // touch pages to force them resident
        volatile uint8_t acc = 0;
        for (size_t i = 0; i < span; i += 4096) acc ^= base[i];
        (void)acc;
      }
      done_start = s;
      done_count = c;
    }
    usleep(2000);
  }
}

}  // namespace

extern "C" {

void *fio_open(const char *path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void *map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto *v = new Video();
  v->fd = fd;
  v->map = (const uint8_t *)map;
  v->map_len = st.st_size;
  if (!parse_npy(v->map, v->map_len, v)) {
    munmap(map, st.st_size);
    close(fd);
    delete v;
    return nullptr;
  }
  v->prefetcher = std::thread(prefetch_loop, v);
  std::lock_guard<std::mutex> g(g_lock);
  g_videos.push_back(v);
  return v;
}

void fio_info(void *h, int64_t dims[4], int *dtype) {
  auto *v = (Video *)h;
  memcpy(dims, v->dims, sizeof(v->dims));
  *dtype = v->dtype;
}

void fio_prefetch(void *h, int64_t start, int64_t count) {
  auto *v = (Video *)h;
  v->want_start.store(start, std::memory_order_relaxed);
  v->want_count.store(count, std::memory_order_relaxed);
}

void fio_fetch_f32(void *h, int64_t start, int64_t count, float *out) {
  auto *v = (Video *)h;
  const int64_t t = v->dims[0];
  const size_t px = (size_t)v->dims[1] * v->dims[2] * v->dims[3];
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int64_t i = 0; i < count; ++i) {
    int64_t src = start + i;
    if (src < 0) src = 0;
    if (src >= t) src = t - 1;  // repeat-last padding
    const uint8_t *fp = v->map + v->data_off + (size_t)src * v->frame_bytes;
    float *op = out + (size_t)i * px;
    if (v->dtype == 1) {
      memcpy(op, fp, px * sizeof(float));
    } else {
      for (size_t j = 0; j < px; ++j) op[j] = fp[j] * kInv255;
    }
  }
}

void fio_close(void *h) {
  auto *v = (Video *)h;
  v->stop.store(true);
  if (v->prefetcher.joinable()) v->prefetcher.join();
  munmap((void *)v->map, v->map_len);
  close(v->fd);
  std::lock_guard<std::mutex> g(g_lock);
  for (auto it = g_videos.begin(); it != g_videos.end(); ++it)
    if (*it == v) {
      g_videos.erase(it);
      break;
    }
  delete v;
}

}  // extern "C"
