// Native host data-plane kernels for graspnet_tpu.
//
// The TPU owns the compute path (XLA/Pallas); these C++ kernels own the
// host-side hot loops that feed it — the parameter-independent FPS seed
// chain precomputed in data workers, nearest-label-point assignment, and
// voxel downsampling of full-resolution capture clouds (up to ~1M points in
// the service configs). They replace the reference's CUDA host wrappers
// (pointnet2/_ext_src/src/*.cpp) in role, with identical numeric semantics
// to the Python/JAX fallbacks so either path can serve any call.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this toolchain).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Furthest point sampling, exact reference semantics
// (sampling_gpu.cu:74-178): index 0 first, skip points with squared norm
// <= 1e-3, min-distance buffer initialized to 1e10, first-index tie-break.
void gn_fps(const float* xyz, int n, int m, int* out) {
  if (m <= 0) return;
  std::vector<float> temp(n, 1e10f);
  std::vector<uint8_t> valid(n);
  for (int k = 0; k < n; ++k) {
    const float x = xyz[k * 3], y = xyz[k * 3 + 1], z = xyz[k * 3 + 2];
    valid[k] = (x * x + y * y + z * z) > 1e-3f;
  }
  int old = 0;
  out[0] = 0;
  for (int j = 1; j < m; ++j) {
    const float x1 = xyz[old * 3], y1 = xyz[old * 3 + 1], z1 = xyz[old * 3 + 2];
    float best = -1.0f;
    int besti = 0;
    for (int k = 0; k < n; ++k) {
      if (!valid[k]) continue;
      const float dx = xyz[k * 3] - x1;
      const float dy = xyz[k * 3 + 1] - y1;
      const float dz = xyz[k * 3 + 2] - z1;
      const float d = dx * dx + dy * dy + dz * dz;
      const float d2 = d < temp[k] ? d : temp[k];
      temp[k] = d2;
      if (d2 > best) {
        best = d2;
        besti = k;
      }
    }
    old = besti;
    out[j] = besti;
  }
}

// Batched FPS over B independent scenes (OpenMP across scenes).
void gn_fps_batch(const float* xyz, int b, int n, int m, int* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < b; ++i) {
    gn_fps(xyz + (int64_t)i * n * 3, n, m, out + (int64_t)i * m);
  }
}

// Nearest reference point per query (argmin over squared distance,
// first-index tie-break) — the seed -> label-point assignment
// (label_generation.py:84-94).
void gn_nearest(const float* query, int nq, const float* ref, int nr,
                int* out) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int i = 0; i < nq; ++i) {
    const float qx = query[i * 3], qy = query[i * 3 + 1], qz = query[i * 3 + 2];
    float best = 1e30f;
    int besti = 0;
    for (int k = 0; k < nr; ++k) {
      const float dx = ref[k * 3] - qx;
      const float dy = ref[k * 3 + 1] - qy;
      const float dz = ref[k * 3 + 2] - qz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < best) {
        best = d;
        besti = k;
      }
    }
    out[i] = besti;
  }
}

// Voxel-grid downsample: centroid per occupied voxel, grid anchored at
// min_bound - voxel/2 (matches graspnet_tpu.postproc.voxel semantics).
// Returns the number of voxels written to out (caller provides capacity n).
int gn_voxel_downsample(const float* pts, int64_t n, float voxel, float* out) {
  if (n == 0) return 0;
  double minb[3] = {1e30, 1e30, 1e30};
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      const double v = pts[i * 3 + c];
      if (v < minb[c]) minb[c] = v;
    }
  }
  for (int c = 0; c < 3; ++c) minb[c] -= 0.5 * voxel;

  struct Acc {
    double s[3] = {0, 0, 0};
    int64_t cnt = 0;
  };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve(n / 4 + 16);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = 0;
    for (int c = 0; c < 3; ++c) {
      const int64_t q =
          (int64_t)std::floor((pts[i * 3 + c] - minb[c]) / voxel);
      key = key * 2097152ull + (uint64_t)(q & 0x1FFFFF);
    }
    Acc& a = cells[key];
    for (int c = 0; c < 3; ++c) a.s[c] += pts[i * 3 + c];
    a.cnt += 1;
  }
  int64_t w = 0;
  for (const auto& kv : cells) {
    for (int c = 0; c < 3; ++c)
      out[w * 3 + c] = (float)(kv.second.s[c] / kv.second.cnt);
    ++w;
  }
  return (int)w;
}

// Fused per-(label point, view) statistics for the compact training-label
// path (train/label_pipeline.prepare_scene_labels).  One pass over the
// object's (Np, V, A*D) score/width arrays computes, per (p, v):
//   lmin = min score where (score > 0 && width <= max_width), else +inf
//   has  = whether any such element exists
//   vmax = raw max score (mask-free; feeds the reference's batch u_max,
//          label_generation.py:114)
// Replaces ~5 numpy passes (bool mask alloc + where + min + any + max).
void gn_label_view_stats(const float* scores, const float* widths,
                         int64_t np_, int v, int ad, float max_width,
                         float* lmin, unsigned char* has, float* vmax) {
#pragma omp parallel for schedule(static)
  for (int64_t p = 0; p < np_; ++p) {
    const float* sp = scores + p * (int64_t)v * ad;
    const float* wp = widths + p * (int64_t)v * ad;
    for (int i = 0; i < v; ++i) {
      const float* sv = sp + (int64_t)i * ad;
      const float* wv = wp + (int64_t)i * ad;
      float mn = INFINITY, mx = -INFINITY;
      bool h = false;
      for (int j = 0; j < ad; ++j) {
        const float x = sv[j];
        if (x > mx) mx = x;
        if (x > 0.f && wv[j] <= max_width) {
          h = true;
          if (x < mn) mn = x;
        }
      }
      const int64_t o = p * (int64_t)v + i;
      lmin[o] = mn;
      has[o] = h ? 1 : 0;
      vmax[o] = mx;
    }
  }
}

int gn_version() { return 2; }

}  // extern "C"
