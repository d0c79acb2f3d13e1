// Async Velodyne scan loader — native runtime component.
//
// Replaces the reference's kittiHelper + ROS transport for dataset ingest
// (src/kittiHelper.cpp:25-35 read_lidar_data + the 10 Hz publish loop):
// a background thread pool reads KITTI `.bin` files (float32 x,y,z,refl
// records), pads them into fixed-capacity pinned buffers (the static shapes
// the XLA pipeline needs), and hands them to Python through a bounded
// prefetch ring — disk I/O and padding overlap with device compute.
//
// C ABI only (ctypes binding in data/native_loader.py; no pybind11 in the
// image). Build: g++ -O2 -shared -fPIC -std=c++17 -pthread.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Scan {
  int64_t index = -1;
  int32_t n_points = 0;          // clamped to capacity
  std::vector<float> xyz;        // capacity * 3, zero-padded
  std::vector<uint8_t> mask;     // capacity, 0/1
  std::vector<float> refl;       // capacity
};

struct Reader {
  std::string pattern;           // printf pattern with one %06ld
  int64_t n_files = 0;
  int32_t capacity = 0;
  int32_t prefetch = 4;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  // min-heap by index so scans come out in order even with several workers
  struct Cmp {
    bool operator()(const Scan* a, const Scan* b) const {
      return a->index > b->index;
    }
  };
  std::priority_queue<Scan*, std::vector<Scan*>, Cmp> ready;
  int64_t next_to_read = 0;      // next file index a worker may claim
  int64_t next_to_emit = 0;      // next index next() must return
  std::atomic<bool> stop{false};

  ~Reader() {
    stop.store(true);
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : workers) {
      if (t.joinable()) t.join();
    }
    std::lock_guard<std::mutex> lk(mu);
    while (!ready.empty()) {
      delete ready.top();
      ready.pop();
    }
  }
};

void worker_loop(Reader* r) {
  while (!r->stop.load()) {
    int64_t idx;
    {
      std::unique_lock<std::mutex> lk(r->mu);
      // bound the look-ahead window
      r->cv_push.wait(lk, [&] {
        return r->stop.load() || (r->next_to_read < r->n_files &&
                                  r->next_to_read < r->next_to_emit + r->prefetch);
      });
      if (r->stop.load() || r->next_to_read >= r->n_files) return;
      idx = r->next_to_read++;
    }

    auto* scan = new Scan();
    scan->index = idx;
    scan->xyz.assign((size_t)r->capacity * 3, 0.f);
    scan->mask.assign((size_t)r->capacity, 0);
    scan->refl.assign((size_t)r->capacity, 0.f);

    char path[4096];
    std::snprintf(path, sizeof(path), r->pattern.c_str(), (long)idx);
    FILE* f = std::fopen(path, "rb");
    if (f) {
      std::vector<float> buf(4096 * 4);
      int32_t n = 0;
      size_t got;
      while ((got = std::fread(buf.data(), sizeof(float), buf.size(), f)) > 0) {
        size_t recs = got / 4;
        for (size_t i = 0; i < recs && n < r->capacity; ++i, ++n) {
          scan->xyz[(size_t)n * 3 + 0] = buf[i * 4 + 0];
          scan->xyz[(size_t)n * 3 + 1] = buf[i * 4 + 1];
          scan->xyz[(size_t)n * 3 + 2] = buf[i * 4 + 2];
          scan->refl[n] = buf[i * 4 + 3];
          scan->mask[n] = 1;
        }
        if (n >= r->capacity) break;
      }
      scan->n_points = n;
      std::fclose(f);
    } else {
      scan->n_points = -1;  // signals missing file
    }

    {
      std::lock_guard<std::mutex> lk(r->mu);
      r->ready.push(scan);
    }
    r->cv_pop.notify_all();
  }
}

}  // namespace

extern "C" {

void* lvo_reader_create(const char* pattern, int64_t n_files, int32_t capacity,
                        int32_t prefetch, int32_t n_threads) {
  auto* r = new Reader();
  r->pattern = pattern;
  r->n_files = n_files;
  r->capacity = capacity;
  r->prefetch = prefetch > 0 ? prefetch : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) r->workers.emplace_back(worker_loop, r);
  return r;
}

// Blocking, in-order pop. Returns the number of valid points, −1 when the
// file was missing, −2 when the sequence is exhausted.
int32_t lvo_reader_next(void* handle, float* xyz_out, uint8_t* mask_out,
                        float* refl_out) {
  auto* r = static_cast<Reader*>(handle);
  Scan* scan = nullptr;
  {
    std::unique_lock<std::mutex> lk(r->mu);
    if (r->next_to_emit >= r->n_files) return -2;
    r->cv_pop.wait(lk, [&] {
      return r->stop.load() ||
             (!r->ready.empty() && r->ready.top()->index == r->next_to_emit);
    });
    if (r->stop.load()) return -2;
    scan = r->ready.top();
    r->ready.pop();
    r->next_to_emit++;
  }
  r->cv_push.notify_all();

  std::memcpy(xyz_out, scan->xyz.data(), scan->xyz.size() * sizeof(float));
  std::memcpy(mask_out, scan->mask.data(), scan->mask.size());
  if (refl_out)
    std::memcpy(refl_out, scan->refl.data(), scan->refl.size() * sizeof(float));
  int32_t n = scan->n_points;
  delete scan;
  return n;
}

void lvo_reader_destroy(void* handle) { delete static_cast<Reader*>(handle); }

}  // extern "C"
