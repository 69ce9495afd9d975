// adt_data: native data-loading runtime for autodiffusion_tpu.
//
// The reference feeds training through torch DataLoader workers
// (guided_diffusion/image_datasets.py:16-92). The TPU-native equivalent
// here is a small C++ runtime exposed over the C ABI (ctypes): it mmaps
// uint8 .npy arrays (the framework's canonical on-disk batch format, e.g.
// ImageNet-64 sample dumps), and assembles shuffled, augmented float32
// batches on a background thread pool with a prefetch ring, so host-side
// preprocessing overlaps device steps.
//
// Build: make -C native   (produces libadt_data.so)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------- npy mmap

struct NpyArray {
  int fd = -1;
  void* map = nullptr;
  size_t map_len = 0;
  const uint8_t* data = nullptr;  // element data
  int64_t dims[8] = {0};
  int ndim = 0;
  size_t itemsize = 0;
  char kind = 0;  // 'u' uint, 'i' int, 'f' float
};

// Parse the npy v1/v2 header; only C-contiguous little-endian arrays.
bool parse_header(const char* hdr, size_t hdr_len, NpyArray* a) {
  std::string h(hdr, hdr_len);
  auto find_val = [&](const std::string& key) -> std::string {
    size_t p = h.find("'" + key + "'");
    if (p == std::string::npos) return "";
    p = h.find(':', p);
    size_t q = h.find_first_of(",}", p);
    // tuples contain commas; special-case shape
    if (key == "shape") q = h.find(')', p);
    return h.substr(p + 1, q - p);
  };
  std::string descr = find_val("descr");
  std::string order = find_val("fortran_order");
  std::string shape = find_val("shape");
  if (order.find("False") == std::string::npos) return false;
  size_t dp = descr.find_first_of("uif");
  if (dp == std::string::npos) return false;
  a->kind = descr[dp];
  a->itemsize = std::strtol(descr.c_str() + dp + 1, nullptr, 10);
  if (a->itemsize == 0) return false;
  // parse shape tuple
  a->ndim = 0;
  const char* s = shape.c_str();
  while (*s && a->ndim < 8) {
    while (*s && !isdigit(*s)) s++;
    if (!*s) break;
    a->dims[a->ndim++] = std::strtoll(s, const_cast<char**>(&s), 10);
  }
  return a->ndim > 0;
}

NpyArray* npy_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { ::close(fd); return nullptr; }
  const uint8_t* p = static_cast<const uint8_t*>(map);
  if (st.st_size < 10 || memcmp(p, "\x93NUMPY", 6) != 0) {
    munmap(map, st.st_size); ::close(fd); return nullptr;
  }
  uint8_t major = p[6];
  size_t hdr_len, hdr_off;
  if (major == 1) { hdr_len = p[8] | (p[9] << 8); hdr_off = 10; }
  else { hdr_len = p[8] | (p[9] << 8) | (p[10] << 16) | ((size_t)p[11] << 24); hdr_off = 12; }
  auto* a = new NpyArray();
  a->fd = fd; a->map = map; a->map_len = st.st_size;
  if (!parse_header(reinterpret_cast<const char*>(p + hdr_off), hdr_len, a)) {
    munmap(map, st.st_size); ::close(fd); delete a; return nullptr;
  }
  // the header-declared payload must fit inside the mapped file: a
  // truncated dump otherwise SIGBUSes inside a detached worker thread
  // with no Python exception and no hint of which file was bad
  size_t total = a->itemsize;
  for (int i = 0; i < a->ndim; i++) total *= (size_t)a->dims[i];
  if (hdr_off + hdr_len + total > (size_t)st.st_size) {
    std::fprintf(stderr,
                 "adt_data: %s is truncated (header declares %zu data "
                 "bytes, file holds %zu)\n",
                 path, total, (size_t)st.st_size - hdr_off - hdr_len);
    munmap(map, st.st_size); ::close(fd); delete a; return nullptr;
  }
  a->data = p + hdr_off + hdr_len;
  return a;
}

void npy_close(NpyArray* a) {
  if (!a) return;
  if (a->map) munmap(a->map, a->map_len);
  if (a->fd >= 0) ::close(a->fd);
  delete a;
}

// ----------------------------------------------------------------- loader

struct Batch {
  std::vector<float> x;
  std::vector<int64_t> y;
};

struct Loader {
  const NpyArray* images = nullptr;   // [N, H, W, C] uint8
  const NpyArray* labels = nullptr;   // [N] integer, optional
  int batch = 0;
  int crop = 0;                       // output H=W=crop (center crop); 0 = full
  bool random_flip = false;
  bool shuffle = true;
  uint64_t seed = 0;

  std::vector<int64_t> order;
  size_t cursor = 0;
  int epoch = 0;

  // prefetch ring. Batches are pushed in draw order (seq): without the
  // sequencing, multi-worker delivery order would depend on thread
  // scheduling and two same-seeded runs would see different batch
  // sequences despite the fully seeded shuffle/augmentation design.
  std::queue<Batch> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  size_t max_ready = 4;
  uint64_t seq_draw = 0;   // next sequence number handed to a worker
  uint64_t seq_push = 0;   // next sequence number allowed to push
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};
  std::mutex sched_mu;                // serializes index-draw + epoch logic

  int64_t n() const { return images->dims[0]; }
  int h() const { return (int)images->dims[1]; }
  int w() const { return (int)images->dims[2]; }
  int c() const { return images->ndim > 3 ? (int)images->dims[3] : 1; }
  int oh() const { return crop ? crop : h(); }
  int ow() const { return crop ? crop : w(); }
};

void fill_batch(Loader* L, const std::vector<int64_t>& idx, uint64_t rng_seed,
                Batch* out) {
  const int H = L->h(), W = L->w(), C = L->c();
  const int OH = L->oh(), OW = L->ow();
  const int top = (H - OH) / 2, left = (W - OW) / 2;
  std::mt19937_64 rng(rng_seed);
  out->x.resize(idx.size() * (size_t)OH * OW * C);
  out->y.resize(L->labels ? idx.size() : 0);
  for (size_t b = 0; b < idx.size(); b++) {
    const uint8_t* src = L->images->data + (size_t)idx[b] * H * W * C;
    bool flip = L->random_flip && (rng() & 1);
    float* dst = out->x.data() + b * (size_t)OH * OW * C;
    for (int i = 0; i < OH; i++) {
      const uint8_t* row = src + ((size_t)(top + i) * W + left) * C;
      float* drow = dst + (size_t)i * OW * C;
      if (!flip) {
        for (int j = 0; j < OW * C; j++)
          drow[j] = row[j] * (1.0f / 127.5f) - 1.0f;
      } else {
        for (int j = 0; j < OW; j++)
          for (int k = 0; k < C; k++)
            drow[j * C + k] = row[(OW - 1 - j) * C + k] * (1.0f / 127.5f) - 1.0f;
      }
    }
    if (L->labels) {
      const uint8_t* lp = L->labels->data + (size_t)idx[b] * L->labels->itemsize;
      // widen with correct signedness (a raw memcpy into a zeroed int64
      // would map an int32 -1 to 4294967295)
      int64_t v = 0;
      bool sgn = L->labels->kind == 'i';
      switch (L->labels->itemsize) {
        case 1: v = sgn ? (int64_t)*(const int8_t*)lp : (int64_t)*lp; break;
        case 2: v = sgn ? (int64_t)*(const int16_t*)lp
                        : (int64_t)*(const uint16_t*)lp; break;
        case 4: v = sgn ? (int64_t)*(const int32_t*)lp
                        : (int64_t)*(const uint32_t*)lp; break;
        default: memcpy(&v, lp, sizeof(v)); break;  // 8-byte
      }
      out->y[b] = v;
    }
  }
}

void worker_loop(Loader* L) {
  while (!L->stop.load()) {
    std::vector<int64_t> idx;
    uint64_t rng_seed, my_seq;
    {
      std::lock_guard<std::mutex> lk(L->sched_mu);
      if (L->cursor + L->batch > L->order.size()) {
        L->epoch++;
        L->cursor = 0;
        if (L->shuffle) {
          std::mt19937_64 rng(L->seed + L->epoch);
          std::shuffle(L->order.begin(), L->order.end(), rng);
        }
      }
      idx.assign(L->order.begin() + L->cursor,
                 L->order.begin() + L->cursor + L->batch);
      rng_seed = L->seed * 1000003u + L->epoch * 7919u + L->cursor;
      L->cursor += L->batch;
      my_seq = L->seq_draw++;
    }
    Batch b;
    fill_batch(L, idx, rng_seed, &b);
    {
      std::unique_lock<std::mutex> lk(L->mu);
      // publish strictly in draw order so delivery is reproducible
      L->cv_space.wait(lk, [L, my_seq] {
        return (L->seq_push == my_seq && L->ready.size() < L->max_ready)
               || L->stop.load(); });
      if (L->stop.load()) return;
      L->ready.push(std::move(b));
      L->seq_push++;
    }
    L->cv_ready.notify_one();
    L->cv_space.notify_all();   // wake the worker holding the next seq
  }
}

}  // namespace

extern "C" {

void* adt_npy_open(const char* path) { return npy_open(path); }

int adt_npy_ndim(void* h) { return static_cast<NpyArray*>(h)->ndim; }

void adt_npy_shape(void* h, int64_t* dims) {
  auto* a = static_cast<NpyArray*>(h);
  memcpy(dims, a->dims, a->ndim * sizeof(int64_t));
}

void adt_npy_close(void* h) { npy_close(static_cast<NpyArray*>(h)); }

void* adt_loader_create(void* images, void* labels, int batch, int crop,
                        int random_flip, int shuffle, uint64_t seed,
                        int num_workers, int prefetch) {
  auto* L = new Loader();
  L->images = static_cast<NpyArray*>(images);
  L->labels = static_cast<NpyArray*>(labels);
  // refuse configurations that would read out of bounds: a batch larger
  // than the dataset over-reads the order vector; a crop larger than the
  // image makes the centering offset negative; non-1-byte pixels would be
  // indexed at the wrong stride (fill_batch addresses in uint8 units)
  if (L->images == nullptr || batch <= 0 ||
      (int64_t)batch > L->images->dims[0] ||
      crop > L->images->dims[1] || crop > L->images->dims[2] ||
      L->images->itemsize != 1 || L->images->kind != 'u') {
    delete L;
    return nullptr;
  }
  // labels must be integer and of a width the fill loop widens correctly;
  // a float32 labels file would otherwise be bit-reinterpreted into
  // garbage classes with no error
  if (L->labels != nullptr &&
      ((L->labels->kind != 'i' && L->labels->kind != 'u') ||
       (L->labels->itemsize != 1 && L->labels->itemsize != 2 &&
        L->labels->itemsize != 4 && L->labels->itemsize != 8))) {
    delete L;
    return nullptr;
  }
  L->batch = batch;
  L->crop = crop;
  L->random_flip = random_flip;
  L->shuffle = shuffle;
  L->seed = seed;
  L->max_ready = prefetch > 0 ? prefetch : 4;
  L->order.resize(L->n());
  for (int64_t i = 0; i < L->n(); i++) L->order[i] = i;
  if (shuffle) {
    std::mt19937_64 rng(seed);
    std::shuffle(L->order.begin(), L->order.end(), rng);
  }
  int nw = num_workers > 0 ? num_workers : 2;
  for (int i = 0; i < nw; i++) L->workers.emplace_back(worker_loop, L);
  return L;
}

// Copy the next ready batch into caller buffers. Returns batch size.
int adt_loader_next(void* h, float* x_out, int64_t* y_out) {
  auto* L = static_cast<Loader*>(h);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [L] { return !L->ready.empty(); });
    b = std::move(L->ready.front());
    L->ready.pop();
  }
  // notify_all: only the worker holding the next seq may push, and it is
  // not necessarily the one notify_one would wake
  L->cv_space.notify_all();
  memcpy(x_out, b.x.data(), b.x.size() * sizeof(float));
  if (y_out && !b.y.empty())
    memcpy(y_out, b.y.data(), b.y.size() * sizeof(int64_t));
  return L->batch;
}

void adt_loader_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
