// orbit2-tpu native sample store — the TPU-host replacement for ORNL
// DDStore (reference src/climate_learn/dist/distdataset.py + pyddstore,
// C++/MPI one-sided comms; see SURVEY.md §2.6/§2.10#3).
//
// Role: the reference re-reads npz shards from Lustre every epoch unless
// DDStore materializes each rank's shard in RAM and serves global random
// access over RDMA. On TPU VMs the data-parallel shard already lives on the
// host, so the store is host-local: samples are drained from the Python
// pipeline ONCE (epoch-0 cost, like DistDataset:129-149), packed into large
// contiguous arenas, and every later epoch assembles shuffled batches with
// multi-threaded gathers into caller-provided pinned buffers ready for
// jax.device_put. Cross-host exchange stays in JAX-land (each host feeds its
// own mesh slice), so no MPI is needed — the fabric work DDStore did with
// libfabric is exactly what ICI/DCN already does for device arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsamplestore.so samplestore.cpp -lpthread
// (orbit2_tpu/native/build.py does this on first use and caches the .so.)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Arena {
  // fixed-stride sample arena; grows by large blocks to avoid realloc copies
  size_t stride = 0;  // bytes per sample
  size_t block_samples = 0;
  std::vector<char*> blocks;
  size_t count = 0;

  explicit Arena(size_t stride_bytes, size_t block_bytes = (size_t)1 << 30)
      : stride(stride_bytes),
        block_samples(stride_bytes ? std::max<size_t>(1, block_bytes / stride_bytes) : 1) {}

  ~Arena() {
    for (char* b : blocks) ::operator delete[](b, std::align_val_t(64));
  }

  char* slot(size_t i) const {
    return blocks[i / block_samples] + (i % block_samples) * stride;
  }

  size_t add(const void* src) {
    if (count == blocks.size() * block_samples) {
      blocks.push_back(static_cast<char*>(
          ::operator new[](block_samples * stride, std::align_val_t(64))));
    }
    std::memcpy(slot(count), src, stride);
    return count++;
  }
};

struct Store {
  Arena x;
  Arena y;
  std::mutex mu;
  unsigned n_threads;

  Store(size_t x_stride, size_t y_stride, unsigned threads)
      : x(x_stride), y(y_stride),
        n_threads(threads ? threads : std::max(1u, std::thread::hardware_concurrency())) {}
};

void parallel_gather(const Arena& a, const int64_t* idx, size_t n, char* out,
                     unsigned n_threads) {
  if (n == 0) return;
  n_threads = std::max(1u, std::min<unsigned>(n_threads, (unsigned)n));
  auto work = [&](size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i)
      std::memcpy(out + i * a.stride, a.slot((size_t)idx[i]), a.stride);
  };
  if (n_threads == 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ts;
  size_t per = (n + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; ++t) {
    size_t lo = t * per, hi = std::min(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void* o2_store_create(size_t x_bytes_per_sample, size_t y_bytes_per_sample,
                      unsigned n_threads) {
  return new Store(x_bytes_per_sample, y_bytes_per_sample, n_threads);
}

void o2_store_destroy(void* s) { delete static_cast<Store*>(s); }

// add one (x, y) sample; returns its index
int64_t o2_store_add(void* s, const void* x, const void* y) {
  Store* st = static_cast<Store*>(s);
  std::lock_guard<std::mutex> lock(st->mu);
  size_t ix = st->x.add(x);
  size_t iy = st->y.add(y);
  return (int64_t)(ix == iy ? ix : iy);
}

int64_t o2_store_size(void* s) {
  return (int64_t) static_cast<Store*>(s)->x.count;
}

size_t o2_store_x_stride(void* s) { return static_cast<Store*>(s)->x.stride; }
size_t o2_store_y_stride(void* s) { return static_cast<Store*>(s)->y.stride; }

// gather n samples by index into contiguous out buffers (multi-threaded)
void o2_store_gather(void* s, const int64_t* indices, size_t n, void* x_out,
                     void* y_out) {
  Store* st = static_cast<Store*>(s);
  parallel_gather(st->x, indices, n, static_cast<char*>(x_out), st->n_threads);
  parallel_gather(st->y, indices, n, static_cast<char*>(y_out), st->n_threads);
}

// deterministic epoch permutation (mt19937 Fisher-Yates), like the
// reference's DistributedSampler shuffle (itermodule.py:404)
void o2_store_epoch_perm(void* s, uint64_t seed, int64_t* out_perm) {
  Store* st = static_cast<Store*>(s);
  size_t n = st->x.count;
  for (size_t i = 0; i < n; ++i) out_perm[i] = (int64_t)i;
  std::mt19937_64 rng(seed);
  for (size_t i = n; i > 1; --i) {
    size_t j = (size_t)(rng() % i);
    std::swap(out_perm[i - 1], out_perm[j]);
  }
}

}  // extern "C"
