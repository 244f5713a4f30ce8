// gsrt native runtime: host-side scene preprocessing.
//
// The reference delegates its host-side heavy lifting to native code —
// embree for BVH construction (lvp_acceleration_structure.c:1301-1351) and
// tinyobjloader/C++ asset parsing (Assets/Model.cpp). This library is the
// TPU framework's equivalent: a radix-sorted Karras LBVH builder and a
// binary-PLY splat parser, exposed over a plain C ABI for ctypes.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct MortonEntry {
  uint32_t code;
  int32_t index;
};

inline uint32_t expand_bits_3(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

inline uint32_t morton3d(float x, float y, float z) {
  auto q = [](float f) {
    float c = f < 0.f ? 0.f : (f > 1023.f ? 1023.f : f);
    return static_cast<uint32_t>(c);
  };
  return (expand_bits_3(q(x)) << 2) | (expand_bits_3(q(y)) << 1) |
         expand_bits_3(q(z));
}

// 3-pass byte-wise LSD radix sort on 30-bit morton codes.
void radix_sort(std::vector<MortonEntry>& a) {
  const size_t n = a.size();
  std::vector<MortonEntry> b(n);
  for (int pass = 0; pass < 4; ++pass) {
    const int shift = pass * 8;
    size_t count[257] = {0};
    for (size_t i = 0; i < n; ++i) count[((a[i].code >> shift) & 0xFF) + 1]++;
    for (int i = 0; i < 256; ++i) count[i + 1] += count[i];
    for (size_t i = 0; i < n; ++i) b[count[(a[i].code >> shift) & 0xFF]++] = a[i];
    a.swap(b);
  }
}

inline int common_prefix(const std::vector<MortonEntry>& m, int i, int j,
                         int n) {
  if (j < 0 || j >= n) return -1;
  uint32_t x = m[i].code ^ m[j].code;
  if (x == 0) return 32 + __builtin_clz((uint32_t)(i ^ j));
  return __builtin_clz(x);
}

}  // namespace

extern "C" {

// Karras 2012 LBVH over n primitive AABBs (n >= 2).
// Outputs match gsrt.ops.bvh.LBVH field-for-field.
int gsrt_build_lbvh(const float* aabb_min, const float* aabb_max, int n,
                    int32_t* left, int32_t* right, uint8_t* left_leaf,
                    uint8_t* right_leaf, float* node_min, float* node_max,
                    int32_t* leaf_prim, float* leaf_min, float* leaf_max) {
  if (n < 2) return -1;

  // morton codes of AABB centers, normalized to the scene bounds
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      float c = 0.5f * (aabb_min[i * 3 + a] + aabb_max[i * 3 + a]);
      lo[a] = std::min(lo[a], c);
      hi[a] = std::max(hi[a], c);
    }
  float scale[3];
  for (int a = 0; a < 3; ++a)
    scale[a] = hi[a] > lo[a] ? 1023.0f / (hi[a] - lo[a]) : 0.0f;

  std::vector<MortonEntry> m(n);
  for (int i = 0; i < n; ++i) {
    float c[3];
    for (int a = 0; a < 3; ++a)
      c[a] = (0.5f * (aabb_min[i * 3 + a] + aabb_max[i * 3 + a]) - lo[a]) *
             scale[a];
    m[i] = {morton3d(c[0], c[1], c[2]), i};
  }
  radix_sort(m);

  for (int i = 0; i < n; ++i) {
    const int p = m[i].index;
    leaf_prim[i] = p;
    for (int a = 0; a < 3; ++a) {
      leaf_min[i * 3 + a] = aabb_min[p * 3 + a];
      leaf_max[i * 3 + a] = aabb_max[p * 3 + a];
    }
  }

  // internal nodes (Karras: each node i determined independently)
  for (int i = 0; i < n - 1; ++i) {
    const int d = (common_prefix(m, i, i + 1, n) -
                   common_prefix(m, i, i - 1, n)) >= 0 ? 1 : -1;
    const int delta_min = common_prefix(m, i, i - d, n);
    int lmax = 2;
    while (common_prefix(m, i, i + lmax * d, n) > delta_min) lmax *= 2;
    int l = 0;
    for (int t = lmax / 2; t >= 1; t /= 2)
      if (common_prefix(m, i, i + (l + t) * d, n) > delta_min) l += t;
    const int j = i + l * d;
    const int delta_node = common_prefix(m, i, j, n);
    int s = 0;
    for (int div = 2;; div *= 2) {
      const int t = (l + div - 1) / div;
      if (common_prefix(m, i, i + (s + t) * d, n) > delta_node) s += t;
      if (t <= 1) break;
    }
    const int gamma = i + s * d + std::min(d, 0);
    const int first = std::min(i, j);
    const int last = std::max(i, j);
    left[i] = gamma;
    right[i] = gamma + 1;
    left_leaf[i] = (first == gamma) ? 1 : 0;
    right_leaf[i] = (last == gamma + 1) ? 1 : 0;
  }

  // node AABBs bottom-up: process nodes in decreasing range size via a
  // simple post-order stack from the root.
  std::vector<int32_t> stack;
  std::vector<int32_t> order;
  stack.reserve(64);
  order.reserve(n - 1);
  stack.push_back(0);
  while (!stack.empty()) {
    int node = stack.back();
    stack.pop_back();
    order.push_back(node);
    if (!left_leaf[node]) stack.push_back(left[node]);
    if (!right_leaf[node]) stack.push_back(right[node]);
  }
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    const int node = *it;
    const float* amin = left_leaf[node] ? &leaf_min[left[node] * 3]
                                        : &node_min[left[node] * 3];
    const float* amax = left_leaf[node] ? &leaf_max[left[node] * 3]
                                        : &node_max[left[node] * 3];
    const float* bmin = right_leaf[node] ? &leaf_min[right[node] * 3]
                                         : &node_min[right[node] * 3];
    const float* bmax = right_leaf[node] ? &leaf_max[right[node] * 3]
                                         : &node_max[right[node] * 3];
    for (int a = 0; a < 3; ++a) {
      node_min[node * 3 + a] = std::min(amin[a], bmin[a]);
      node_max[node * 3 + a] = std::max(amax[a], bmax[a]);
    }
  }
  return 0;
}

// Parse an INRIA 3DGS binary PLY buffer into SoA arrays.
// props: stride in floats; offsets of x, f_dc_0, f_rest_0, opacity,
// scale_0, rot_0 within a row (all little-endian float32), n_rest floats.
// Outputs: means[n*3], sh[n*K*3] (K=(deg+1)^2 laid out coeff-major per
// splat), opacity[n] (sigmoid applied), scales[n*3] (exp), quats[n*4].
int gsrt_parse_ply_rows(const char* data, long long n, int stride_f,
                        int off_xyz, int off_dc, int off_rest, int n_rest,
                        int off_opacity, int off_scale, int off_rot,
                        int K, float* means, float* sh, float* opacity,
                        float* scales, float* quats) {
  const float* rows = reinterpret_cast<const float*>(data);
  const int rest_per_ch = n_rest / 3;
  const int use_rest = std::min(rest_per_ch, K - 1);
  auto parse_range = [&](long long lo, long long hi) {
    for (long long i = lo; i < hi; ++i) {
      const float* r = rows + i * stride_f;
      means[i * 3 + 0] = r[off_xyz + 0];
      means[i * 3 + 1] = r[off_xyz + 1];
      means[i * 3 + 2] = r[off_xyz + 2];
      for (int c = 0; c < 3; ++c) sh[(i * K + 0) * 3 + c] = r[off_dc + c];
      for (int k = 0; k < use_rest; ++k)
        for (int c = 0; c < 3; ++c)
          sh[(i * K + 1 + k) * 3 + c] = r[off_rest + c * rest_per_ch + k];
      opacity[i] = 1.0f / (1.0f + std::exp(-r[off_opacity]));
      for (int a = 0; a < 3; ++a)
        scales[i * 3 + a] = std::exp(r[off_scale + a]);
      for (int a = 0; a < 4; ++a) quats[i * 4 + a] = r[off_rot + a];
    }
  };
  // rows are independent and output ranges disjoint — split across cores
  // (the 1.24 GB / 5M-splat scene parsed serially was the load-time
  // bottleneck; see README scale notes)
  const unsigned hw = std::thread::hardware_concurrency();
  const long long n_threads =
      std::min<long long>(std::max(1u, hw), std::max(1ll, n / (1ll << 16)));
  if (n_threads <= 1) {
    parse_range(0, n);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  const long long step = (n + n_threads - 1) / n_threads;
  for (long long t = 0; t < n_threads; ++t)
    pool.emplace_back(parse_range, t * step,
                      std::min(n, (t + 1) * step));
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
