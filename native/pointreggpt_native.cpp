// Native host runtime for pointreggpt_tpu (C ABI, loaded via ctypes).
//
// The reference delegates its host-side hot paths to C++ libraries (Open3D
// voxel downsample / KD-trees, libpng via PIL; SURVEY.md §2.1). The TPU
// build moves the device-worthy parts onto the chip; what remains hot on the
// host — depth-PNG preprocessing in the training dataloader, PLY packing,
// and CPU fallbacks for voxel/radius ops when no accelerator is attached —
// lives here.
//
// Build: cc -O3 -shared -fPIC -o _pointreggpt_native.so pointreggpt_native.cpp
// (see native/build.py; loaded by pointreggpt_tpu.native).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Depth preprocessing: raw uint16 mm frame -> model-space float32 [0,1].
// NEAREST short-side resize (PIL pixel mapping: src = floor((i+0.5)/scale)),
// center crop (round-half-up offsets, torchvision parity), scale 1e-4,
// clip >1 -> 0, optional horizontal flip.  Reference pipeline: sdd:1535-1554.
// out must hold out_size*out_size floats. Returns 0 on success.
int depth_preprocess(const uint16_t* raw, int h, int w, int out_size,
                     int flip, float* out) {
  if (h <= 0 || w <= 0 || out_size <= 0) return 1;
  // short-side resize dims
  int new_h, new_w;
  if (h <= w) {
    new_h = out_size;
    new_w = (int)std::nearbyint((double)out_size * w / h);
  } else {
    new_w = out_size;
    new_h = (int)std::nearbyint((double)out_size * h / w);
  }
  if (new_h < out_size || new_w < out_size) return 2;
  // center-crop offsets (round half to even: Python round() parity)
  const int top = (int)std::nearbyint((new_h - out_size) / 2.0);
  const int left = (int)std::nearbyint((new_w - out_size) / 2.0);

  const double sy = (double)h / new_h;
  const double sx = (double)w / new_w;
  for (int r = 0; r < out_size; ++r) {
    // PIL NEAREST: src index = floor((dst + 0.5) * scale)
    int sr = (int)((r + top + 0.5) * sy);
    if (sr >= h) sr = h - 1;
    const uint16_t* row = raw + (size_t)sr * w;
    for (int c = 0; c < out_size; ++c) {
      int cc = flip ? (out_size - 1 - c) : c;
      int sc = (int)((cc + left + 0.5) * sx);
      if (sc >= w) sc = w - 1;
      float v = row[sc] * 1e-4f;
      out[(size_t)r * out_size + c] = (v > 1.0f) ? 0.0f : v;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Voxel-grid downsample (host fallback; Open3D semantics: floor((p - min)/v),
// centroid per occupied voxel).  Returns the number of output points
// (<= n); out must hold n*3 floats.
int voxel_downsample(const float* pts, int64_t n, float voxel, float* out) {
  if (n <= 0) return 0;
  float mn[3] = {INFINITY, INFINITY, INFINITY};
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k)
      if (pts[i * 3 + k] < mn[k]) mn[k] = pts[i * 3 + k];

  struct Acc {
    double s[3] = {0, 0, 0};
    int64_t cnt = 0;
    int64_t order = 0;
  };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve((size_t)n);
  int64_t next_order = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = 0;
    for (int k = 0; k < 3; ++k) {
      int64_t q = (int64_t)std::floor((pts[i * 3 + k] - mn[k]) / voxel);
      key = key * 2097152u + (uint64_t)(q & 0x1FFFFF);  // 21 bits/axis
    }
    Acc& a = cells[key];
    if (a.cnt == 0) a.order = next_order++;
    for (int k = 0; k < 3; ++k) a.s[k] += pts[i * 3 + k];
    a.cnt++;
  }
  // deterministic output: first-occurrence order
  std::vector<const Acc*> ordered(cells.size());
  for (const auto& kv : cells) ordered[(size_t)kv.second.order] = &kv.second;
  int64_t m = 0;
  for (const Acc* a : ordered) {
    for (int k = 0; k < 3; ++k)
      out[m * 3 + k] = (float)(a->s[k] / a->cnt);
    ++m;
  }
  return (int)m;
}

// ---------------------------------------------------------------------------
// Radius-hit test (host fallback for overlap computation): for each src
// point, 1 if any tgt point lies within radius. Uniform-grid hash over tgt.
// hits must hold n_src uint8.
void radius_hits(const float* src, int64_t n_src, const float* tgt,
                 int64_t n_tgt, float radius, uint8_t* hits) {
  std::memset(hits, 0, (size_t)n_src);
  if (n_src <= 0 || n_tgt <= 0) return;
  const float cell = radius;
  std::unordered_map<uint64_t, std::vector<int64_t>> grid;
  grid.reserve((size_t)n_tgt);
  auto key_of = [cell](const float* p) -> uint64_t {
    uint64_t key = 0;
    for (int k = 0; k < 3; ++k) {
      int64_t q = (int64_t)std::floor(p[k] / cell);
      key = key * 2097152u + (uint64_t)(q & 0x1FFFFF);
    }
    return key;
  };
  for (int64_t j = 0; j < n_tgt; ++j) grid[key_of(tgt + j * 3)].push_back(j);

  const float r2 = radius * radius;
  for (int64_t i = 0; i < n_src; ++i) {
    const float* s = src + i * 3;
    bool hit = false;
    for (int dx = -1; dx <= 1 && !hit; ++dx)
      for (int dy = -1; dy <= 1 && !hit; ++dy)
        for (int dz = -1; dz <= 1 && !hit; ++dz) {
          float probe[3] = {s[0] + dx * cell, s[1] + dy * cell,
                            s[2] + dz * cell};
          auto it = grid.find(key_of(probe));
          if (it == grid.end()) continue;
          for (int64_t j : it->second) {
            const float* t = tgt + j * 3;
            float d0 = s[0] - t[0], d1 = s[1] - t[1], d2 = s[2] - t[2];
            if (d0 * d0 + d1 * d1 + d2 * d2 <= r2) {
              hit = true;
              break;
            }
          }
        }
    hits[i] = hit ? 1 : 0;
  }
}

// ---------------------------------------------------------------------------
// Binary little-endian PLY vertex packing: writes header + float32 xyz body
// into buf. Returns the number of bytes written, or -1 if buf_size too
// small.  (File IO stays in Python; this packs the bytes.)
int64_t ply_pack(const float* pts, int64_t n, char* buf, int64_t buf_size) {
  char header[256];
  int hlen = std::snprintf(header, sizeof(header),
                           "ply\nformat binary_little_endian 1.0\n"
                           "element vertex %lld\n"
                           "property float x\nproperty float y\n"
                           "property float z\nend_header\n",
                           (long long)n);
  int64_t total = hlen + n * 12;
  if (total > buf_size) return -1;
  std::memcpy(buf, header, (size_t)hlen);
  std::memcpy(buf + hlen, pts, (size_t)(n * 12));
  return total;
}

}  // extern "C"
