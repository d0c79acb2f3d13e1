// Native polar scan packer — the host side of the minimum-byte TPU ingest.
//
// Mirrors lidar_visual_odometry_tpu/ops/pointcloud.pack_polar_scan (which in
// turn encodes the ring/azimuth bucketing of the reference's
// scanRegistration.cpp:160-241): raw float32 xyz points -> dense
// (ring, azimuth) uint16 image of (quantized range, packed int8 angular
// offsets), nearest return winning a cell.
//
// Why native: the numpy packer costs ~16 ms per 112k-point HDL-64 frame —
// more than the whole per-frame device+transfer budget of the pipeline it
// feeds. This single-pass C++ version is ~1 ms/frame and packs the frames of
// a chunk on separate threads, so host packing fully disappears under device
// compute (models/pipeline.py overlaps pack(k+1) with chunk k).
//
// Built on first use by lidar_visual_odometry_tpu/data/native_pack.py
// (g++ -O2 -shared), bound via ctypes. No dependencies beyond the C++17
// standard library.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kRangeQ = 131.072f / 65536.0f;  // 2 mm, matches POLAR_RANGE_Q
constexpr float kPi = 3.14159265358979323846f;

struct RingTable {
  float nominal[64];  // radians
  float el_q;         // radians per offset count
};

// Nominal per-ring elevations + offset quantum; mirrors
// pointcloud.ring_elevations (reference formulas scanRegistration.cpp:168-199)
static bool ring_table(int n_scans, RingTable* t) {
  double half_deg;
  if (n_scans == 16) {
    for (int i = 0; i < 16; ++i) t->nominal[i] = float((-15.0 + 2.0 * i) * M_PI / 180.0);
    half_deg = 1.0;
  } else if (n_scans == 32) {
    for (int i = 0; i < 32; ++i)
      t->nominal[i] = float(((i + 0.5) * 4.0 / 3.0 - 92.0 / 3.0) * M_PI / 180.0);
    half_deg = 2.0 / 3.0;
  } else if (n_scans == 64) {
    for (int i = 0; i < 64; ++i) {
      double deg = (i < 32) ? (2.0 - i / 3.0) : (-8.83 - (i - 32) / 2.0);
      t->nominal[i] = float(deg * M_PI / 180.0);
    }
    half_deg = 0.25;
  } else {
    return false;
  }
  t->el_q = float(half_deg * M_PI / 180.0 / 127.0);
  return true;
}

// ring id + acceptance, mirroring pointcloud._ring_index_np /
// ring_index_hdl (scanRegistration.cpp:168-199 incl. the HDL-64 FOV gates)
static inline bool ring_of(float angle_deg, int n_scans, int* ring) {
  int r;
  if (n_scans == 16) {
    r = int(std::floor((angle_deg + 15.0f) / 2.0f + 0.5f));
    if (r < 0 || r > 15) return false;
  } else if (n_scans == 32) {
    r = int(std::floor((angle_deg + 92.0f / 3.0f) * 3.0f / 4.0f));
    if (r < 0 || r > 31) return false;
  } else {  // 64
    if (angle_deg > 2.0f || angle_deg < -24.33f) return false;
    if (angle_deg >= -8.83f)
      r = int(std::floor((2.0f - angle_deg) * 3.0f + 0.5f));
    else
      r = 32 + int(std::floor((-8.83f - angle_deg) * 2.0f + 0.5f));
    if (r < 0 || r > 50) return false;
    if (r > 63) return false;
  }
  *ring = r;
  return true;
}

static void pack_one(const float* pts, int64_t n, int64_t stride,
                     int n_scans, int width, float min_range, float max_range,
                     const RingTable& table, uint16_t* out, float* best) {
  const int64_t cells = int64_t(n_scans) * width;
  std::memset(out, 0, size_t(cells) * 2 * sizeof(uint16_t));
  for (int64_t c = 0; c < cells; ++c) best[c] = 1e30f;

  const float az_q = kPi / float(width) / 127.0f;
  const float inv_two_pi_w = float(width) / (2.0f * kPi);

  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * stride + 0];
    const float y = pts[i * stride + 1];
    const float z = pts[i * stride + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    const float d2 = x * x + y * y;
    const float rng = std::sqrt(d2 + z * z);
    if (!(rng > min_range && rng < max_range)) continue;
    const float dxy = std::sqrt(d2);
    const float elev = std::atan2(z, dxy);
    const float angle_deg = elev * (180.0f / kPi);
    int ring;
    if (!ring_of(angle_deg, n_scans, &ring)) continue;

    const float ori = -std::atan2(y, x);
    int col = int(std::floor((ori + kPi) * inv_two_pi_w));
    if (col < 0) col = 0;
    if (col >= width) col = width - 1;

    const int64_t cell = int64_t(ring) * width + col;
    if (rng >= best[cell]) continue;
    best[cell] = rng;

    const float d_el = elev - table.nominal[ring];
    const float d_az = ori - (-kPi + (float(col) + 0.5f) * (2.0f * kPi / float(width)));
    int qel = int(std::nearbyint(d_el / table.el_q));
    int qaz = int(std::nearbyint(d_az / az_q));
    qel = qel < -127 ? -127 : (qel > 127 ? 127 : qel);
    qaz = qaz < -127 ? -127 : (qaz > 127 ? 127 : qaz);
    float qrf = std::nearbyint(rng / kRangeQ);
    uint16_t qr = qrf < 1.0f ? 1 : (qrf > 65535.0f ? 65535 : uint16_t(qrf));

    out[cell * 2 + 0] = qr;
    out[cell * 2 + 1] = uint16_t(((qel + 128) << 8) | (qaz + 128));
  }
}

}  // namespace

extern "C" {

// Pack n_frames scans (array-of-pointers, each (counts[f], stride) float32
// row-major with xyz in the first 3 columns) into out
// (n_frames, n_scans, width, 2) uint16. Frames pack on parallel threads.
// Returns 0 on success, -1 on unsupported n_scans.
int lvo_pack_polar(const float* const* pts, const int64_t* counts,
                   int32_t n_frames, int64_t stride,
                   int32_t n_scans, int32_t width,
                   float min_range, float max_range, uint16_t* out) {
  RingTable table;
  if (!ring_table(n_scans, &table)) return -1;
  const int64_t cells = int64_t(n_scans) * width;

  int n_threads = int(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_frames) n_threads = n_frames;

  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    std::vector<float> best(static_cast<size_t>(cells), 0.0f);
    for (;;) {
      int32_t f = next.fetch_add(1);
      if (f >= n_frames) break;
      pack_one(pts[f], counts[f], stride, n_scans, width, min_range,
               max_range, table, out + int64_t(f) * cells * 2, best.data());
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    ts.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  return 0;
}

}  // extern "C"
