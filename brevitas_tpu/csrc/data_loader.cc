// Native threaded data loader: shuffled batch gather with prefetch.
//
// The reference delegates input pipelines to torch DataLoader workers
// (src/brevitas_examples/bnn_pynq/trainer.py:126-160 builds DataLoader with
// num_workers); this is the framework-native equivalent for the JAX/TPU
// runtime: a C++ thread pool gathers shuffled batches into a ring of
// reusable pinned host buffers while the accelerator runs the previous step,
// so host gather time overlaps device compute.
//
// Plain C ABI (driven from Python via ctypes, brevitas_tpu/data.py):
//   dl_create(...)  -> opaque handle (data/labels are BORROWED pointers;
//                      the caller keeps them alive for the loader lifetime)
//   dl_next(h)      -> index of a filled buffer (blocks until one is ready)
//   dl_buffer_x/y(h, i) -> pointers into buffer i
//   dl_epoch(h)     -> epoch of the most recently returned buffer
//   dl_release(h,i) -> return buffer i to the free pool
//   dl_destroy(h)
//
// Batches are drawn from a per-epoch Fisher-Yates permutation
// (deterministic in `seed`); each worker thread claims the next batch via an
// atomic cursor, gathers rows (uint8 inputs are normalized to float on the
// fly: (x*inv255 - mean) * inv_std), and publishes the buffer to the ready
// queue. Epoch boundaries reshuffle under the queue lock.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Loader {
  const void* data = nullptr;   // borrowed
  const int32_t* labels = nullptr;  // borrowed, may be null
  bool data_is_u8 = false;
  int64_t n = 0, row = 0, batch = 0;
  bool shuffle = true, drop_last = true;
  float mean = 0.f, inv_std = 1.f;

  std::vector<std::vector<float>> buf_x;
  std::vector<std::vector<int32_t>> buf_y;
  std::vector<int64_t> buf_epoch;

  std::vector<int64_t> perm;
  int64_t batches_per_epoch = 0;

  std::mutex mu;
  std::condition_variable cv_free, cv_ready;
  std::queue<int> free_q, ready_q;
  int64_t cursor = 0;  // next batch index within the epoch (under mu)
  int64_t epoch = 0;
  int64_t last_epoch = 0;  // epoch of last dl_next result
  bool stop = false;
  std::mt19937_64 rng;

  std::vector<std::thread> workers;

  void reshuffle_locked() {
    if (!shuffle) return;
    for (int64_t i = n - 1; i > 0; --i) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap(perm[i], perm[d(rng)]);
    }
  }

  void gather(int b, const std::vector<int64_t>& idx, int64_t ep) {
    float* x = buf_x[b].data();
    int32_t* y = buf_y[b].data();
    buf_epoch[b] = ep;
    for (int64_t r = 0; r < batch; ++r) {
      const int64_t src = idx[r];
      if (data_is_u8) {
        const uint8_t* p = static_cast<const uint8_t*>(data) + src * row;
        float* dst = x + r * row;
        constexpr float inv255 = 1.0f / 255.0f;
        for (int64_t c = 0; c < row; ++c)
          dst[c] = (static_cast<float>(p[c]) * inv255 - mean) * inv_std;
      } else {
        std::memcpy(x + r * row,
                    static_cast<const float*>(data) + src * row,
                    sizeof(float) * row);
      }
      if (labels) y[r] = labels[src];
    }
  }

  void work() {
    for (;;) {
      int b;
      int64_t ep;
      std::vector<int64_t> idx(batch);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] { return stop || !free_q.empty(); });
        if (stop) return;
        b = free_q.front();
        free_q.pop();
        if (cursor >= batches_per_epoch) {
          cursor = 0;
          ++epoch;
          reshuffle_locked();
        }
        // snapshot this batch's indices under the lock: a peer thread may
        // reshuffle `perm` at the next epoch boundary while we gather
        const int64_t start = (cursor++) * batch;
        for (int64_t r = 0; r < batch; ++r) idx[r] = perm[(start + r) % n];
        ep = epoch;
      }
      gather(b, idx, ep);
      {
        std::lock_guard<std::mutex> lk(mu);
        ready_q.push(b);
      }
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* dl_create(const void* data, int data_is_u8, const int32_t* labels,
                int64_t n, int64_t row, int64_t batch, int shuffle,
                uint64_t seed, int n_threads, int n_buffers, float mean,
                float std) {
  auto* L = new Loader();
  L->data = data;
  L->data_is_u8 = data_is_u8 != 0;
  L->labels = labels;
  L->n = n;
  L->row = row;
  L->batch = batch;
  L->shuffle = shuffle != 0;
  L->mean = mean;
  L->inv_std = 1.0f / std;
  L->rng.seed(seed);
  L->batches_per_epoch = n / batch;  // drop_last
  if (L->batches_per_epoch == 0) L->batches_per_epoch = 1;
  L->perm.resize(n);
  for (int64_t i = 0; i < n; ++i) L->perm[i] = i;
  L->reshuffle_locked();
  if (n_buffers < 2) n_buffers = 2;
  L->buf_x.resize(n_buffers);
  L->buf_y.resize(n_buffers);
  L->buf_epoch.assign(n_buffers, 0);
  for (int b = 0; b < n_buffers; ++b) {
    L->buf_x[b].resize(batch * row);
    L->buf_y[b].resize(batch);
    L->free_q.push(b);
  }
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

int dl_next(void* h) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] { return !L->ready_q.empty(); });
  int b = L->ready_q.front();
  L->ready_q.pop();
  L->last_epoch = L->buf_epoch[b];
  return b;
}

const float* dl_buffer_x(void* h, int b) {
  return static_cast<Loader*>(h)->buf_x[b].data();
}

const int32_t* dl_buffer_y(void* h, int b) {
  return static_cast<Loader*>(h)->buf_y[b].data();
}

int64_t dl_epoch(void* h) { return static_cast<Loader*>(h)->last_epoch; }

int64_t dl_batches_per_epoch(void* h) {
  return static_cast<Loader*>(h)->batches_per_epoch;
}

void dl_release(void* h, int b) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->free_q.push(b);
  }
  L->cv_free.notify_one();
}

void dl_destroy(void* h) {
  auto* L = static_cast<Loader*>(h);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_free.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
