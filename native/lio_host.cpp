// Native host-side runtime for fast_lio_tpu.
//
// The reference implements its entire host path in C++ (preprocess.cpp's
// per-vendor decoders feeding the estimator).  Here the TPU owns the
// estimation; the native layer owns the high-rate host work that sits in
// front of the device: raw-packet decoding with tag/blind/decimation gates
// (preprocess.cpp:92-456 semantics) and a hash-based voxel-grid downsample
// for host-side tooling.  Exposed as a plain C ABI consumed through ctypes
// (fast_lio_tpu/native.py); a numpy fallback keeps the package importable
// without the shared library.
//
// Build: make -C native   (produces liblio_host.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// --- Livox CustomMsg point stream decode (preprocess.cpp:161-186) ---------
// inputs are parallel arrays of length n; outputs are caller-allocated with
// capacity n.  Returns the number of points kept.
int decode_avia(const float* xyz,            // n*3
                const float* reflectivity,   // n
                const int64_t* offset_ns,    // n
                const uint8_t* tag,          // n
                const uint8_t* line,         // n
                int n,
                int n_scans,
                double blind,
                int point_filter_num,
                float* out_xyz,              // cap n*3
                double* out_t_s,             // cap n
                float* out_intensity) {      // cap n
  const double blind2 = blind * blind;
  int kept = 0;
  int valid_num = 0;
  for (int i = 1; i < n; ++i) {
    const uint8_t t30 = tag[i] & 0x30;
    if (line[i] >= n_scans || (t30 != 0x10 && t30 != 0x00)) continue;
    ++valid_num;
    if (valid_num % point_filter_num != 0) continue;
    const float* p = xyz + 3 * i;
    const float* q = xyz + 3 * (i - 1);
    const bool moved = std::fabs(p[0] - q[0]) > 1e-7f ||
                       std::fabs(p[1] - q[1]) > 1e-7f ||
                       std::fabs(p[2] - q[2]) > 1e-7f;
    const double r2 = (double)p[0] * p[0] + (double)p[1] * p[1] +
                      (double)p[2] * p[2];
    if (!moved || r2 <= blind2) continue;
    out_xyz[3 * kept + 0] = p[0];
    out_xyz[3 * kept + 1] = p[1];
    out_xyz[3 * kept + 2] = p[2];
    out_t_s[kept] = (double)offset_ns[i] * 1e-9;
    out_intensity[kept] = reflectivity[i];
    ++kept;
  }
  return kept;
}

// --- generic PointCloud2-style decode (Ouster/Velodyne-with-time/MARSIM) ---
// time_scale_to_s: multiply the raw per-point time field by this to get
// seconds (0 => emit zero offsets).  blind_strict: reject r2 < blind^2 (vs
// <=) matching the per-vendor comparisons.
int decode_generic(const float* xyz,
                   const float* intensity,
                   const double* t_raw,
                   int n,
                   double blind,
                   int point_filter_num,
                   double time_scale_to_s,
                   float* out_xyz,
                   double* out_t_s,
                   float* out_intensity) {
  const double blind2 = blind * blind;
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    if (i % point_filter_num != 0) continue;
    const float* p = xyz + 3 * i;
    const double r2 = (double)p[0] * p[0] + (double)p[1] * p[1] +
                      (double)p[2] * p[2];
    if (r2 < blind2) continue;
    out_xyz[3 * kept + 0] = p[0];
    out_xyz[3 * kept + 1] = p[1];
    out_xyz[3 * kept + 2] = p[2];
    out_t_s[kept] = time_scale_to_s > 0 ? t_raw[i] * time_scale_to_s : 0.0;
    out_intensity[kept] = intensity ? intensity[i] : 0.0f;
    ++kept;
  }
  return kept;
}

// --- Velodyne decode incl. azimuth-unwrap time reconstruction --------------
// (preprocess.cpp:284-456 semantics, matching drivers.decode_velodyne.)
// When the driver supplies no per-point time (has_time == 0), offsets are
// reconstructed per ring from the yaw sweep at omega = 0.361 * scan_rate
// deg/ms relative to the ring's FIRST return, with the single monotonicity
// fix-up (+one revolution); the first return of each ring is dropped.
// The per-ring state is streamed in one pass — equivalent to the grouped
// numpy formulation because the fix-up only depends on in-ring point order.
int decode_velodyne(const float* xyz,
                    const float* intensity,
                    const double* t_raw,     // per-point time field
                    const int32_t* ring,     // n
                    int n,
                    int has_time,            // t_raw[n-1] > 0 upstream
                    double scan_rate,
                    double time_scale_to_ms, // raw time field -> ms
                    double blind,
                    int point_filter_num,
                    float* out_xyz,
                    double* out_t_s,
                    float* out_intensity) {
  const double blind2 = blind * blind;
  const double omega_l = 0.361 * scan_rate;       // deg per ms
  const double period = 360.0 / omega_l;          // ms per revolution
  // per-ring unwrap state, sized to the full uint16 ring domain so no two
  // distinct ring ids ever share state (the numpy path groups by exact ring
  // value; masking would alias ring 256 onto ring 0 and break parity)
  constexpr int MAX_RINGS = 65536;
  std::vector<double> yaw_fp(MAX_RINGS);
  std::vector<double> t_last(MAX_RINGS);
  std::vector<uint8_t> seen(MAX_RINGS, 0);
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    const float* p = xyz + 3 * i;
    double t_ms = 0.0;
    bool drop = false;
    if (has_time) {
      t_ms = t_raw[i] * time_scale_to_ms;
    } else {
      const int r = ring[i] & (MAX_RINGS - 1);
      const double yaw =
          std::atan2((double)p[1], (double)p[0]) * 57.2957;
      if (!seen[r]) {
        seen[r] = true;
        yaw_fp[r] = yaw;
        t_last[r] = 0.0;
        drop = true;  // reference continues past each ring's first return
      } else {
        double curv = yaw <= yaw_fp[r] ? (yaw_fp[r] - yaw) / omega_l
                                       : (yaw_fp[r] - yaw + 360.0) / omega_l;
        if (curv < t_last[r]) curv += period;
        t_last[r] = curv;
        t_ms = curv;
      }
    }
    if (i % point_filter_num != 0 || drop) continue;
    const double r2 = (double)p[0] * p[0] + (double)p[1] * p[1] +
                      (double)p[2] * p[2];
    if (!(r2 > blind2)) continue;  // strict > (velodyne_handler comparison)
    out_xyz[3 * kept + 0] = p[0];
    out_xyz[3 * kept + 1] = p[1];
    out_xyz[3 * kept + 2] = p[2];
    out_t_s[kept] = t_ms * 1e-3;
    out_intensity[kept] = intensity ? intensity[i] : 0.0f;
    ++kept;
  }
  return kept;
}

// --- hash voxel-grid downsample (PCL VoxelGrid centroid semantics) ---------
int voxel_downsample(const float* xyz, int n, double leaf,
                     float* out_xyz /* cap n*3 */) {
  struct Acc { double x = 0, y = 0, z = 0; int c = 0; };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve((size_t)n);
  const double inv = 1.0 / leaf;
  for (int i = 0; i < n; ++i) {
    const float* p = xyz + 3 * i;
    const int64_t cx = (int64_t)std::floor(p[0] * inv);
    const int64_t cy = (int64_t)std::floor(p[1] * inv);
    const int64_t cz = (int64_t)std::floor(p[2] * inv);
    const uint64_t key = ((uint64_t)(cx & 0x1FFFFF) << 42) |
                         ((uint64_t)(cy & 0x1FFFFF) << 21) |
                         ((uint64_t)(cz & 0x1FFFFF));
    Acc& a = cells[key];
    a.x += p[0]; a.y += p[1]; a.z += p[2]; ++a.c;
  }
  int kept = 0;
  for (const auto& kv : cells) {
    const Acc& a = kv.second;
    out_xyz[3 * kept + 0] = (float)(a.x / a.c);
    out_xyz[3 * kept + 1] = (float)(a.y / a.c);
    out_xyz[3 * kept + 2] = (float)(a.z / a.c);
    ++kept;
  }
  return kept;
}

}  // extern "C"
