// raytpu_native: host-side hot loops in C++ (the "native runtime" layer).
//
// The reference consumes its native layer as prebuilt LWJGL JNI bindings
// (Assimp .obj import + Vulkan driver calls); our equivalents are a fast
// Wavefront .obj parser and the BVH build/flatten pipeline (the two CPU
// hot loops of the Scene Rebuild Thread, reference
// renderer/SceneBuilder.java + bvh/BVHBuilder.java + bvh/BVHFlattener.java).
//
// Semantics mirror raytracer_tpu/bvh/build.py: deterministic longest-axis
// median split, pre-order flatten, reference node encoding
// (leaf: data=-(tri+1), count=-1; internal: data=left=i+1, count=right)
// plus skip links for stackless traversal. Exposed via a plain C ABI for
// ctypes.
//
// Build: make -C native   (produces raytpu_native.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

constexpr float kAabbEps = 1e-4f;  // reference Triangle.java:61-71

struct Seg {
  int64_t start, end, skip;
};

}  // namespace

extern "C" {

void rt_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// .obj loader: positions + faces (v / v/vt / v//vn / v/vt/vn), negative
// indices, fan triangulation of n-gons (same policy as
// raytracer_tpu/scene/objloader.py and aiProcess_Triangulate).
// Returns triangle count; *out_tris is malloc'd [T, 3, 3] float32 (caller
// frees with rt_free). Returns -1 on IO error, -2 on parse error.
// ---------------------------------------------------------------------------
int64_t rt_load_obj(const char* path, float** out_tris) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';

  std::vector<float> verts;        // xyz triples
  std::vector<int64_t> tri_idx;    // vertex-index triples
  std::vector<int64_t> face;       // scratch

  char* p = buf.data();
  char* end = buf.data() + size;
  while (p < end) {
    // isolate line
    char* line = p;
    while (p < end && *p != '\n') ++p;
    char saved = *p;
    *p = '\0';

    while (*line == ' ' || *line == '\t' || *line == '\r') ++line;
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      char* q = line + 2;
      float x = std::strtof(q, &q);
      float y = std::strtof(q, &q);
      float z = std::strtof(q, &q);
      verts.push_back(x);
      verts.push_back(y);
      verts.push_back(z);
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      face.clear();
      char* q = line + 2;
      while (*q) {
        while (*q == ' ' || *q == '\t' || *q == '\r') ++q;
        if (!*q) break;
        long long i = std::strtoll(q, &q, 10);
        if (i == 0) return -2;
        int64_t nverts = static_cast<int64_t>(verts.size() / 3);
        face.push_back(i > 0 ? i - 1 : nverts + i);
        // skip /vt/vn part
        while (*q && *q != ' ' && *q != '\t' && *q != '\r') ++q;
      }
      for (size_t k = 1; k + 1 < face.size(); ++k) {  // fan
        tri_idx.push_back(face[0]);
        tri_idx.push_back(face[k]);
        tri_idx.push_back(face[k + 1]);
      }
    }
    *p = saved;
    if (p < end) ++p;
  }

  int64_t t = static_cast<int64_t>(tri_idx.size() / 3);
  if (t == 0) return 0;  // faceless .obj: malloc(0) may be NULL != IO error
  float* out = static_cast<float*>(std::malloc(sizeof(float) * t * 9));
  if (!out) return -1;
  int64_t nverts = static_cast<int64_t>(verts.size() / 3);
  for (int64_t i = 0; i < t * 3; ++i) {
    int64_t vi = tri_idx[i];
    if (vi < 0 || vi >= nverts) {
      std::free(out);
      return -2;
    }
    out[i * 3 + 0] = verts[vi * 3 + 0];
    out[i * 3 + 1] = verts[vi * 3 + 1];
    out[i * 3 + 2] = verts[vi * 3 + 2];
  }
  *out_tris = out;
  return t;
}

// ---------------------------------------------------------------------------
// Node count for a median-split tree over n triangles (k -> k/2, k-k/2,
// leaf at k <= leaf_size) — callers preallocate with this.
// ---------------------------------------------------------------------------
int64_t rt_bvh_node_count(int64_t n, int32_t leaf_size) {
  if (n <= 0) return 0;
  int64_t total = 0;
  std::vector<int64_t> stack{n};
  while (!stack.empty()) {
    int64_t k = stack.back();
    stack.pop_back();
    ++total;
    if (k > leaf_size) {
      stack.push_back(k / 2);
      stack.push_back(k - k / 2);
    }
  }
  return total;
}

// ---------------------------------------------------------------------------
// BVH build + pre-order flatten with skip links.
// tris: [n, 3, 3] f32. Outputs preallocated by caller:
//   node_min/node_max: [m, 3] f32; node_tri/node_ntri/node_skip/node_data/
//   node_count: [m] i32; order: [n] i64 (flattened position -> source tri).
// method: 0 = median split (matches the NumPy reference builder exactly),
//         1 = binned SAH (16 bins; higher-quality tree, same layout —
//             note the node count is data-dependent, returned by
//             rt_build_bvh_sah_count).
// Returns node count m, or -1 on error.
// ---------------------------------------------------------------------------
int64_t rt_build_bvh(const float* tris, int64_t n, int32_t leaf_size,
                     float* node_min, float* node_max, int32_t* node_tri,
                     int32_t* node_ntri, int32_t* node_skip,
                     int32_t* node_data, int32_t* node_count,
                     int64_t* order) {
  if (n <= 0 || leaf_size < 1) return -1;
  const int64_t m = rt_bvh_node_count(n, leaf_size);

  // Per-triangle AABBs (epsilon-padded on thin axes) + centers.
  std::vector<float> lo(n * 3), hi(n * 3), center(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      float a = tris[i * 9 + 0 + ax];
      float b = tris[i * 9 + 3 + ax];
      float c = tris[i * 9 + 6 + ax];
      float mn = std::min(a, std::min(b, c));
      float mx = std::max(a, std::max(b, c));
      if (mx - mn < kAabbEps) {
        mn -= kAabbEps;
        mx += kAabbEps;
      }
      lo[i * 3 + ax] = mn;
      hi[i * 3 + ax] = mx;
      center[i * 3 + ax] = 0.5f * (mn + mx);
    }
  }

  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;

  int64_t next_node = 0;
  int64_t next_tri = 0;
  std::vector<Seg> stack;
  stack.push_back({0, n, m});

  while (!stack.empty()) {
    Seg seg = stack.back();
    stack.pop_back();
    const int64_t my = next_node++;
    const int64_t k = seg.end - seg.start;

    float bmin[3] = {INFINITY, INFINITY, INFINITY};
    float bmax[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int64_t i = seg.start; i < seg.end; ++i) {
      const int64_t t = idx[i];
      for (int ax = 0; ax < 3; ++ax) {
        bmin[ax] = std::min(bmin[ax], lo[t * 3 + ax]);
        bmax[ax] = std::max(bmax[ax], hi[t * 3 + ax]);
      }
    }
    for (int ax = 0; ax < 3; ++ax) {
      node_min[my * 3 + ax] = bmin[ax];
      node_max[my * 3 + ax] = bmax[ax];
    }
    node_skip[my] = static_cast<int32_t>(seg.skip);

    if (k <= leaf_size) {
      node_tri[my] = static_cast<int32_t>(next_tri);
      node_ntri[my] = static_cast<int32_t>(k);
      node_data[my] = -static_cast<int32_t>(next_tri + 1);
      node_count[my] = -1;
      for (int64_t i = 0; i < k; ++i) order[next_tri + i] = idx[seg.start + i];
      next_tri += k;
      continue;
    }

    int axis = 0;
    float ext = bmax[0] - bmin[0];
    for (int ax = 1; ax < 3; ++ax) {
      float e = bmax[ax] - bmin[ax];
      if (e > ext) {
        ext = e;
        axis = ax;
      }
    }

    int64_t* base = idx.data() + seg.start;
    if (k == 2) {
      if (center[base[0] * 3 + axis] > center[base[1] * 3 + axis])
        std::swap(base[0], base[1]);
    } else {
      std::nth_element(base, base + k / 2, base + k,
                       [&](int64_t a, int64_t b) {
                         return center[a * 3 + axis] < center[b * 3 + axis];
                       });
    }
    const int64_t mid = seg.start + k / 2;

    int64_t left_nodes = rt_bvh_node_count(k / 2, leaf_size);
    int64_t right_index = my + 1 + left_nodes;
    node_tri[my] = -1;
    node_ntri[my] = 0;
    node_data[my] = static_cast<int32_t>(my + 1);
    node_count[my] = static_cast<int32_t>(right_index);
    stack.push_back({mid, seg.end, seg.skip});       // right (popped last)
    stack.push_back({seg.start, mid, right_index});  // left (popped first)
  }

  return (next_node == m && next_tri == n) ? m : -1;
}

// ---------------------------------------------------------------------------
// Binned-SAH BVH build + pre-order flatten with skip links.
//
// Same outputs/layout as rt_build_bvh, but splits minimize the surface
// area heuristic over 16 centroid bins instead of the median — fewer node
// visits per ray (the reference's random-axis median split is the quality
// floor; this is the production-quality tree). Node count is
// data-dependent: caller allocates for the worst case (2*n-1) and the
// actual count is returned.
// ---------------------------------------------------------------------------
namespace {

struct BuildNode {
  float bmin[3], bmax[3];
  int64_t left = -1, right = -1;  // build-node ids; -1 for leaf
  int64_t first = 0, count = 0;   // leaf range into idx[]
};

inline float half_area(const float* bmin, const float* bmax) {
  float dx = std::max(0.0f, bmax[0] - bmin[0]);
  float dy = std::max(0.0f, bmax[1] - bmin[1]);
  float dz = std::max(0.0f, bmax[2] - bmin[2]);
  return dx * dy + dy * dz + dz * dx;
}

}  // namespace

int64_t rt_build_bvh_sah(const float* tris, int64_t n, int32_t leaf_size,
                         float* node_min, float* node_max,
                         int32_t* node_tri, int32_t* node_ntri,
                         int32_t* node_skip, int32_t* node_data,
                         int32_t* node_count, int64_t* order) {
  if (n <= 0 || leaf_size < 1) return -1;
  constexpr int kBins = 16;

  std::vector<float> lo(n * 3), hi(n * 3), center(n * 3);
  for (int64_t i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      float a = tris[i * 9 + 0 + ax];
      float b = tris[i * 9 + 3 + ax];
      float c = tris[i * 9 + 6 + ax];
      float mn = std::min(a, std::min(b, c));
      float mx = std::max(a, std::max(b, c));
      if (mx - mn < kAabbEps) {
        mn -= kAabbEps;
        mx += kAabbEps;
      }
      lo[i * 3 + ax] = mn;
      hi[i * 3 + ax] = mx;
      center[i * 3 + ax] = 0.5f * (mn + mx);
    }
  }

  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;

  std::vector<BuildNode> nodes;
  nodes.reserve(2 * n);

  struct Item {
    int64_t start, end, slot;
  };
  std::vector<Item> stack;
  nodes.emplace_back();
  stack.push_back({0, n, 0});

  while (!stack.empty()) {
    Item seg = stack.back();
    stack.pop_back();
    BuildNode& nd = nodes[seg.slot];
    const int64_t k = seg.end - seg.start;

    float bmin[3] = {INFINITY, INFINITY, INFINITY};
    float bmax[3] = {-INFINITY, -INFINITY, -INFINITY};
    float cmin[3] = {INFINITY, INFINITY, INFINITY};
    float cmax[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int64_t i = seg.start; i < seg.end; ++i) {
      const int64_t t = idx[i];
      for (int ax = 0; ax < 3; ++ax) {
        bmin[ax] = std::min(bmin[ax], lo[t * 3 + ax]);
        bmax[ax] = std::max(bmax[ax], hi[t * 3 + ax]);
        cmin[ax] = std::min(cmin[ax], center[t * 3 + ax]);
        cmax[ax] = std::max(cmax[ax], center[t * 3 + ax]);
      }
    }
    std::memcpy(nd.bmin, bmin, sizeof bmin);
    std::memcpy(nd.bmax, bmax, sizeof bmax);

    if (k <= leaf_size) {
      nd.first = seg.start;
      nd.count = k;
      continue;
    }

    // Binned SAH over each axis.
    float best_cost = INFINITY;
    int best_axis = -1, best_bin = -1;
    for (int ax = 0; ax < 3; ++ax) {
      const float ext = cmax[ax] - cmin[ax];
      if (ext <= 0.0f) continue;
      const float inv = kBins / ext;
      int64_t cnt[kBins] = {};
      float blo[kBins][3], bhi[kBins][3];
      for (int b = 0; b < kBins; ++b)
        for (int a2 = 0; a2 < 3; ++a2) {
          blo[b][a2] = INFINITY;
          bhi[b][a2] = -INFINITY;
        }
      for (int64_t i = seg.start; i < seg.end; ++i) {
        const int64_t t = idx[i];
        int b = static_cast<int>((center[t * 3 + ax] - cmin[ax]) * inv);
        b = std::min(b, kBins - 1);
        ++cnt[b];
        for (int a2 = 0; a2 < 3; ++a2) {
          blo[b][a2] = std::min(blo[b][a2], lo[t * 3 + a2]);
          bhi[b][a2] = std::max(bhi[b][a2], hi[t * 3 + a2]);
        }
      }
      // Sweep: suffix areas then prefix.
      float rarea[kBins];
      float acc_lo[3] = {INFINITY, INFINITY, INFINITY};
      float acc_hi[3] = {-INFINITY, -INFINITY, -INFINITY};
      int64_t rcnt[kBins];
      int64_t acc_n = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        for (int a2 = 0; a2 < 3; ++a2) {
          acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
          acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
        }
        acc_n += cnt[b];
        rarea[b] = half_area(acc_lo, acc_hi);
        rcnt[b] = acc_n;
      }
      for (int a2 = 0; a2 < 3; ++a2) {
        acc_lo[a2] = INFINITY;
        acc_hi[a2] = -INFINITY;
      }
      acc_n = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        for (int a2 = 0; a2 < 3; ++a2) {
          acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
          acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
        }
        acc_n += cnt[b];
        if (acc_n == 0 || acc_n == k) continue;
        const float cost = acc_n * half_area(acc_lo, acc_hi)
            + rcnt[b + 1] * rarea[b + 1];
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = ax;
          best_bin = b;
        }
      }
    }

    int64_t mid;
    if (best_axis >= 0) {
      const float inv = kBins / (cmax[best_axis] - cmin[best_axis]);
      const float cmin_ax = cmin[best_axis];
      int64_t* base = idx.data();
      int64_t* split = std::partition(
          base + seg.start, base + seg.end, [&](int64_t t) {
            int b = static_cast<int>(
                (center[t * 3 + best_axis] - cmin_ax) * inv);
            return std::min(b, kBins - 1) <= best_bin;
          });
      mid = split - base;
      if (mid == seg.start || mid == seg.end) mid = seg.start + k / 2;
    } else {
      // All centroids coincide: median fallback.
      mid = seg.start + k / 2;
    }

    const int64_t li = static_cast<int64_t>(nodes.size());
    nodes.emplace_back();
    const int64_t ri = static_cast<int64_t>(nodes.size());
    nodes.emplace_back();
    nodes[seg.slot].left = li;
    nodes[seg.slot].right = ri;
    stack.push_back({mid, seg.end, ri});
    stack.push_back({seg.start, mid, li});
  }

  // Subtree sizes (iterative post-order via reverse build order: children
  // always have larger build ids than their parent).
  const int64_t bn = static_cast<int64_t>(nodes.size());
  std::vector<int64_t> size(bn, 1);
  for (int64_t i = bn - 1; i >= 0; --i)
    if (nodes[i].left >= 0)
      size[i] = 1 + size[nodes[i].left] + size[nodes[i].right];

  // Pre-order flatten with skip links.
  struct FItem {
    int64_t bnode, skip;
  };
  std::vector<FItem> fstack;
  fstack.push_back({0, size[0]});
  int64_t next_node = 0, next_tri = 0;
  while (!fstack.empty()) {
    FItem f = fstack.back();
    fstack.pop_back();
    const BuildNode& nd = nodes[f.bnode];
    const int64_t my = next_node++;
    for (int ax = 0; ax < 3; ++ax) {
      node_min[my * 3 + ax] = nd.bmin[ax];
      node_max[my * 3 + ax] = nd.bmax[ax];
    }
    node_skip[my] = static_cast<int32_t>(f.skip);
    if (nd.left < 0) {
      node_tri[my] = static_cast<int32_t>(next_tri);
      node_ntri[my] = static_cast<int32_t>(nd.count);
      node_data[my] = -static_cast<int32_t>(next_tri + 1);
      node_count[my] = -1;
      for (int64_t i = 0; i < nd.count; ++i)
        order[next_tri + i] = idx[nd.first + i];
      next_tri += nd.count;
    } else {
      const int64_t right_index = my + 1 + size[nd.left];
      node_tri[my] = -1;
      node_ntri[my] = 0;
      node_data[my] = static_cast<int32_t>(my + 1);
      node_count[my] = static_cast<int32_t>(right_index);
      fstack.push_back({nd.right, f.skip});
      fstack.push_back({nd.left, right_index});
    }
  }
  return (next_tri == n) ? next_node : -1;
}

// ---------------------------------------------------------------------------
// SBVH: binned-SAH build with SPATIAL SPLITS (Stich et al., HPG 2009,
// simplified: reference boxes are plane-clipped; no triangle-polygon
// re-clipping, no unsplitting). Straddling triangles are duplicated into
// both children with their boxes clipped at the split plane, which
// shrinks overlapping leaf bounds — fewer false leaf visits on meshes
// whose triangles straddle natural partitions (the leaf Möller–Trumbore
// work that dominates bounce traversal, PERF_NOTES.md). Correctness:
// the two clipped boxes union to the original, so every surface point of
// a triangle stays covered by at least one of its references; duplicate
// MT tests return identical t (strict < keeps the first).
//
// Same outputs/layout as rt_build_bvh_sah, except `order` may contain a
// triangle index more than once: caller allocates order[max_refs] and
// node arrays for 2*max_refs-1; the actual reference count is
// sum(node_ntri) and the node count is returned. Spatial splits stop
// when the duplication budget (max_refs) is reached.
// ---------------------------------------------------------------------------
namespace {

struct SRef {
  int32_t tri;
  float lo[3], hi[3];
};

struct SNode {
  float bmin[3], bmax[3];
  int64_t left = -1, right = -1;
  int64_t first = 0, count = 0;  // leaf: range into the leaf-ref pool
};

float ref_union_area(const std::vector<SRef>& refs, float bmin[3],
                     float bmax[3]) {
  for (int ax = 0; ax < 3; ++ax) {
    bmin[ax] = INFINITY;
    bmax[ax] = -INFINITY;
  }
  for (const SRef& r : refs)
    for (int ax = 0; ax < 3; ++ax) {
      bmin[ax] = std::min(bmin[ax], r.lo[ax]);
      bmax[ax] = std::max(bmax[ax], r.hi[ax]);
    }
  return half_area(bmin, bmax);
}

struct SbvhCtx {
  std::vector<SNode> nodes;
  std::vector<SRef> leaf_pool;
  int64_t ref_count = 0;   // live references (duplication tracking)
  int64_t max_refs = 0;
  int32_t leaf_size = 8;
  float root_area = 1.0f;
};

int64_t sbvh_build_rec(SbvhCtx& ctx, std::vector<SRef> refs) {
  constexpr int kBins = 16;
  constexpr float kAlpha = 1e-5f;  // min child-overlap/root-area to try
                                   // a spatial split (Stich's alpha)
  const int64_t slot = static_cast<int64_t>(ctx.nodes.size());
  ctx.nodes.emplace_back();
  float bmin[3], bmax[3];
  ref_union_area(refs, bmin, bmax);
  std::memcpy(ctx.nodes[slot].bmin, bmin, sizeof bmin);
  std::memcpy(ctx.nodes[slot].bmax, bmax, sizeof bmax);
  const int64_t k = static_cast<int64_t>(refs.size());

  if (k <= ctx.leaf_size) {
    ctx.nodes[slot].first = static_cast<int64_t>(ctx.leaf_pool.size());
    ctx.nodes[slot].count = k;
    for (const SRef& r : refs) ctx.leaf_pool.push_back(r);
    return slot;
  }

  // Centroid bounds.
  float cmin[3] = {INFINITY, INFINITY, INFINITY};
  float cmax[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (const SRef& r : refs)
    for (int ax = 0; ax < 3; ++ax) {
      const float c = 0.5f * (r.lo[ax] + r.hi[ax]);
      cmin[ax] = std::min(cmin[ax], c);
      cmax[ax] = std::max(cmax[ax], c);
    }

  // --- object split: binned SAH over reference centroids ---
  float obj_cost = INFINITY;
  int obj_axis = -1, obj_bin = -1;
  float obj_overlap = -INFINITY;  // SA of child-box intersection
  for (int ax = 0; ax < 3; ++ax) {
    const float ext = cmax[ax] - cmin[ax];
    if (ext <= 0.0f) continue;
    const float inv = kBins / ext;
    int64_t cnt[kBins] = {};
    float blo[kBins][3], bhi[kBins][3];
    for (int b = 0; b < kBins; ++b)
      for (int a2 = 0; a2 < 3; ++a2) {
        blo[b][a2] = INFINITY;
        bhi[b][a2] = -INFINITY;
      }
    for (const SRef& r : refs) {
      int b = static_cast<int>((0.5f * (r.lo[ax] + r.hi[ax]) - cmin[ax])
                               * inv);
      b = std::min(std::max(b, 0), kBins - 1);
      ++cnt[b];
      for (int a2 = 0; a2 < 3; ++a2) {
        blo[b][a2] = std::min(blo[b][a2], r.lo[a2]);
        bhi[b][a2] = std::max(bhi[b][a2], r.hi[a2]);
      }
    }
    float racc_lo[kBins][3], racc_hi[kBins][3];
    float acc_lo[3] = {INFINITY, INFINITY, INFINITY};
    float acc_hi[3] = {-INFINITY, -INFINITY, -INFINITY};
    int64_t rcnt[kBins];
    int64_t acc_n = 0;
    for (int b = kBins - 1; b >= 1; --b) {
      for (int a2 = 0; a2 < 3; ++a2) {
        acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
        acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
      }
      acc_n += cnt[b];
      std::memcpy(racc_lo[b], acc_lo, sizeof acc_lo);
      std::memcpy(racc_hi[b], acc_hi, sizeof acc_hi);
      rcnt[b] = acc_n;
    }
    for (int a2 = 0; a2 < 3; ++a2) {
      acc_lo[a2] = INFINITY;
      acc_hi[a2] = -INFINITY;
    }
    acc_n = 0;
    for (int b = 0; b < kBins - 1; ++b) {
      for (int a2 = 0; a2 < 3; ++a2) {
        acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
        acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
      }
      acc_n += cnt[b];
      if (acc_n == 0 || acc_n == k) continue;
      const float cost = acc_n * half_area(acc_lo, acc_hi)
          + rcnt[b + 1] * half_area(racc_lo[b + 1], racc_hi[b + 1]);
      if (cost < obj_cost) {
        obj_cost = cost;
        obj_axis = ax;
        obj_bin = b;
        // Child overlap box SA (spatial-split gate).
        float olo[3], ohi[3];
        bool any = true;
        for (int a2 = 0; a2 < 3; ++a2) {
          olo[a2] = std::max(acc_lo[a2], racc_lo[b + 1][a2]);
          ohi[a2] = std::min(acc_hi[a2], racc_hi[b + 1][a2]);
          if (ohi[a2] < olo[a2]) any = false;
        }
        obj_overlap = any ? half_area(olo, ohi) : 0.0f;
      }
    }
  }

  // --- spatial split: bin references into plane-bounded slabs ---
  float sp_cost = INFINITY;
  int sp_axis = -1;
  float sp_pos = 0.0f;
  // Hard duplication budget: a spatial split can add at most k refs
  // (every ref straddles); only attempt one if even that fits.
  const bool budget_ok = ctx.ref_count + k <= ctx.max_refs;
  if (obj_axis >= 0 && budget_ok
      && obj_overlap / ctx.root_area > kAlpha) {
    for (int ax = 0; ax < 3; ++ax) {
      const float ext = bmax[ax] - bmin[ax];
      if (ext <= 0.0f) continue;
      const float binw = ext / kBins;
      const float inv = 1.0f / binw;
      int64_t entry[kBins] = {}, exit_[kBins] = {};
      float blo[kBins][3], bhi[kBins][3];
      for (int b = 0; b < kBins; ++b)
        for (int a2 = 0; a2 < 3; ++a2) {
          blo[b][a2] = INFINITY;
          bhi[b][a2] = -INFINITY;
        }
      for (const SRef& r : refs) {
        int b0 = static_cast<int>((r.lo[ax] - bmin[ax]) * inv);
        int b1 = static_cast<int>((r.hi[ax] - bmin[ax]) * inv);
        b0 = std::min(std::max(b0, 0), kBins - 1);
        b1 = std::min(std::max(b1, 0), kBins - 1);
        ++entry[b0];
        ++exit_[b1];
        for (int b = b0; b <= b1; ++b) {
          // Reference box clipped to the bin slab (box clip — looser
          // than polygon clip but cheap).
          const float slab_lo = bmin[ax] + b * binw;
          const float slab_hi = slab_lo + binw;
          for (int a2 = 0; a2 < 3; ++a2) {
            float l = r.lo[a2], h = r.hi[a2];
            if (a2 == ax) {
              l = std::max(l, slab_lo);
              h = std::min(h, slab_hi);
            }
            blo[b][a2] = std::min(blo[b][a2], l);
            bhi[b][a2] = std::max(bhi[b][a2], h);
          }
        }
      }
      // Sweep planes between bins.
      float racc_lo[kBins][3], racc_hi[kBins][3];
      float acc_lo[3] = {INFINITY, INFINITY, INFINITY};
      float acc_hi[3] = {-INFINITY, -INFINITY, -INFINITY};
      int64_t rcnt[kBins];
      int64_t acc_n = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        for (int a2 = 0; a2 < 3; ++a2) {
          acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
          acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
        }
        acc_n += exit_[b];
        std::memcpy(racc_lo[b], acc_lo, sizeof acc_lo);
        std::memcpy(racc_hi[b], acc_hi, sizeof acc_hi);
        rcnt[b] = acc_n;
      }
      for (int a2 = 0; a2 < 3; ++a2) {
        acc_lo[a2] = INFINITY;
        acc_hi[a2] = -INFINITY;
      }
      acc_n = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        for (int a2 = 0; a2 < 3; ++a2) {
          acc_lo[a2] = std::min(acc_lo[a2], blo[b][a2]);
          acc_hi[a2] = std::max(acc_hi[a2], bhi[b][a2]);
        }
        acc_n += entry[b];
        const int64_t ln = acc_n, rn = rcnt[b + 1];
        if (ln == 0 || rn == 0) continue;
        const float cost = ln * half_area(acc_lo, acc_hi)
            + rn * half_area(racc_lo[b + 1], racc_hi[b + 1]);
        if (cost < sp_cost) {
          sp_cost = cost;
          sp_axis = ax;
          sp_pos = bmin[ax] + (b + 1) * binw;
        }
      }
    }
  }

  std::vector<SRef> lrefs, rrefs;
  if (sp_axis >= 0 && sp_cost < obj_cost) {
    // Spatial split: clip straddlers into both sides. (The chosen plane
    // has entry/exit counts > 0 on both sides, so neither child can be
    // empty.)
    int64_t dup = 0;
    for (const SRef& r : refs) {
      if (r.hi[sp_axis] <= sp_pos) {
        lrefs.push_back(r);
      } else if (r.lo[sp_axis] >= sp_pos) {
        rrefs.push_back(r);
      } else {
        SRef a = r, b = r;
        a.hi[sp_axis] = sp_pos;
        b.lo[sp_axis] = sp_pos;
        lrefs.push_back(a);
        rrefs.push_back(b);
        ++dup;
      }
    }
    if (lrefs.empty() || rrefs.empty()
        || static_cast<int64_t>(lrefs.size()) == k
        || static_cast<int64_t>(rrefs.size()) == k) {
      lrefs.clear();  // no progress; fall back to the object split
      rrefs.clear();
    } else {
      ctx.ref_count += dup;
    }
  }
  if (lrefs.empty() || rrefs.empty()) {
    lrefs.clear();
    rrefs.clear();
    if (obj_axis >= 0) {
      const float inv = kBins / (cmax[obj_axis] - cmin[obj_axis]);
      for (const SRef& r : refs) {
        int b = static_cast<int>(
            (0.5f * (r.lo[obj_axis] + r.hi[obj_axis]) - cmin[obj_axis])
            * inv);
        b = std::min(std::max(b, 0), kBins - 1);
        (b <= obj_bin ? lrefs : rrefs).push_back(r);
      }
    }
    if (lrefs.empty() || rrefs.empty()) {
      // All centroids coincide: median fallback.
      lrefs.clear();
      rrefs.clear();
      std::vector<SRef> sorted = refs;
      const int ax = obj_axis >= 0 ? obj_axis : 0;
      std::nth_element(
          sorted.begin(), sorted.begin() + k / 2, sorted.end(),
          [&](const SRef& a, const SRef& b) {
            return a.lo[ax] + a.hi[ax] < b.lo[ax] + b.hi[ax];
          });
      lrefs.assign(sorted.begin(), sorted.begin() + k / 2);
      rrefs.assign(sorted.begin() + k / 2, sorted.end());
    }
  }
  refs.clear();
  refs.shrink_to_fit();

  const int64_t li = sbvh_build_rec(ctx, std::move(lrefs));
  const int64_t ri = sbvh_build_rec(ctx, std::move(rrefs));
  ctx.nodes[slot].left = li;
  ctx.nodes[slot].right = ri;
  return slot;
}

}  // namespace

int64_t rt_build_bvh_sbvh(const float* tris, int64_t n, int32_t leaf_size,
                          int64_t max_refs, float* node_min,
                          float* node_max, int32_t* node_tri,
                          int32_t* node_ntri, int32_t* node_skip,
                          int32_t* node_data, int32_t* node_count,
                          int64_t* order) {
  if (n <= 0 || leaf_size < 1 || max_refs < n) return -1;

  std::vector<SRef> refs(n);
  for (int64_t i = 0; i < n; ++i) {
    refs[i].tri = static_cast<int32_t>(i);
    for (int ax = 0; ax < 3; ++ax) {
      float a = tris[i * 9 + 0 + ax];
      float b = tris[i * 9 + 3 + ax];
      float c = tris[i * 9 + 6 + ax];
      float mn = std::min(a, std::min(b, c));
      float mx = std::max(a, std::max(b, c));
      if (mx - mn < kAabbEps) {
        mn -= kAabbEps;
        mx += kAabbEps;
      }
      refs[i].lo[ax] = mn;
      refs[i].hi[ax] = mx;
    }
  }

  SbvhCtx ctx;
  ctx.leaf_size = leaf_size;
  ctx.max_refs = max_refs;
  ctx.ref_count = n;
  float rb_lo[3], rb_hi[3];
  ctx.root_area = std::max(ref_union_area(refs, rb_lo, rb_hi), 1e-12f);
  ctx.nodes.reserve(2 * n);
  ctx.leaf_pool.reserve(n + n / 4);
  sbvh_build_rec(ctx, std::move(refs));

  // Subtree sizes (children have larger build ids than their parent).
  const int64_t bn = static_cast<int64_t>(ctx.nodes.size());
  std::vector<int64_t> size(bn, 1);
  for (int64_t i = bn - 1; i >= 0; --i)
    if (ctx.nodes[i].left >= 0)
      size[i] = 1 + size[ctx.nodes[i].left] + size[ctx.nodes[i].right];

  // Pre-order flatten with skip links (same as rt_build_bvh_sah, but the
  // emitted order entries come from the duplicated leaf-ref pool and
  // node bounds are the CLIPPED reference unions).
  struct FI {
    int64_t bnode, skip;
  };
  std::vector<FI> fstack;
  fstack.push_back({0, size[0]});
  int64_t next_node = 0, next_tri = 0;
  while (!fstack.empty()) {
    FI f = fstack.back();
    fstack.pop_back();
    const SNode& nd = ctx.nodes[f.bnode];
    const int64_t my = next_node++;
    for (int ax = 0; ax < 3; ++ax) {
      node_min[my * 3 + ax] = nd.bmin[ax];
      node_max[my * 3 + ax] = nd.bmax[ax];
    }
    node_skip[my] = static_cast<int32_t>(f.skip);
    if (nd.left < 0) {
      node_tri[my] = static_cast<int32_t>(next_tri);
      node_ntri[my] = static_cast<int32_t>(nd.count);
      node_data[my] = -static_cast<int32_t>(next_tri + 1);
      node_count[my] = -1;
      for (int64_t i = 0; i < nd.count; ++i)
        order[next_tri + i] = ctx.leaf_pool[nd.first + i].tri;
      next_tri += nd.count;
    } else {
      const int64_t right_index = my + 1 + size[nd.left];
      node_tri[my] = -1;
      node_ntri[my] = 0;
      node_data[my] = static_cast<int32_t>(my + 1);
      node_count[my] = static_cast<int32_t>(right_index);
      fstack.push_back({nd.right, f.skip});
      fstack.push_back({nd.left, right_index});
    }
  }
  return next_node;
}

// ---------------------------------------------------------------------------
// PLOC build (Meister & Bittner 2018) with capped agglomerative leaves —
// the native twin of bvh/ploc.py, replicating its exact semantics (same
// Morton quantization, same candidate scan order d1-fwd, d1-bwd, d2-fwd,
// ..., strict-< tie-breaks, mutual-pair merges) so both builders emit the
// SAME tree. exp35: 0.89-0.92x visit events vs the binned-SAH sweep on
// two_humans — leaf CONTENT (capped agglomeration instead of fixed
// Morton runs) is most of the win. Outputs/layout = rt_build_bvh_sah;
// node count (2*L-1, L = data-dependent leaf count) is returned, caller
// allocates the 2*n-1 worst case.
// ---------------------------------------------------------------------------
}  // extern "C" (the round helper below is a template — C++ linkage)

namespace {

inline uint64_t ploc_expand_bits(uint64_t v) {
  v = (v * 0x00010001ULL) & 0xFF0000FFULL;
  v = (v * 0x00000101ULL) & 0x0F00F00FULL;
  v = (v * 0x00000011ULL) & 0xC30C30C3ULL;
  v = (v * 0x00000005ULL) & 0x49249249ULL;
  return v;
}

inline float ploc_sa(const float* lo, const float* hi) {
  float dx = std::max(0.0f, hi[0] - lo[0]);
  float dy = std::max(0.0f, hi[1] - lo[1]);
  float dz = std::max(0.0f, hi[2] - lo[2]);
  return dx * dy + dy * dz + dz * dx;
}

// One mutual-merge round over the first n active slots. best_j uses the
// candidate order d=1 fwd, d=1 bwd, d=2 fwd, ... with strict < (matches
// the NumPy vector scan). Returns the number of merges applied via the
// `merge` callback (called with left slot i and right slot j = best[i],
// i < j); the caller then compacts.
template <typename CostFn, typename MergeFn>
int64_t ploc_round(int64_t n, int window, CostFn cost, MergeFn merge,
                   std::vector<int64_t>& best) {
  const int w = static_cast<int>(std::min<int64_t>(window, n - 1));
  best.assign(n, -1);
  std::vector<float> bc(n, INFINITY);
  std::vector<float> cd(n);
  for (int d = 1; d <= w; ++d) {
    // Two passes per distance, forward ends first, matching the NumPy
    // vector scan's tie order (strict <, first-seen wins): candidate
    // priority for a slot is d1-fwd, d1-bwd, d2-fwd, ...
    for (int64_t i = 0; i + d < n; ++i) {
      cd[i] = cost(i, i + d);
      if (cd[i] < bc[i]) { bc[i] = cd[i]; best[i] = i + d; }
    }
    for (int64_t i = 0; i + d < n; ++i) {
      if (cd[i] < bc[i + d]) { bc[i + d] = cd[i]; best[i + d] = i; }
    }
  }
  int64_t merged = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t j = best[i];
    if (j > i && best[j] == i) {
      merge(i, j);
      ++merged;
    }
  }
  return merged;
}

}  // namespace

extern "C" {

int64_t rt_build_bvh_ploc(const float* tris, int64_t n, int32_t leaf_size,
                          int32_t window,
                          float* node_min, float* node_max,
                          int32_t* node_tri, int32_t* node_ntri,
                          int32_t* node_skip, int32_t* node_data,
                          int32_t* node_count, int64_t* order) {
  if (n <= 0 || leaf_size < 1) return -1;

  // AABBs (epsilon-padded) + scene bounds.
  std::vector<float> lo(n * 3), hi(n * 3);
  float smin[3] = {INFINITY, INFINITY, INFINITY};
  float smax[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (int64_t i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      float a = tris[i * 9 + 0 + ax];
      float b = tris[i * 9 + 3 + ax];
      float c = tris[i * 9 + 6 + ax];
      float mn = std::min(a, std::min(b, c));
      float mx = std::max(a, std::max(b, c));
      if (mx - mn < kAabbEps) {
        mn -= kAabbEps;
        mx += kAabbEps;
      }
      lo[i * 3 + ax] = mn;
      hi[i * 3 + ax] = mx;
      smin[ax] = std::min(smin[ax], mn);
      smax[ax] = std::max(smax[ax], mx);
    }
  }

  // Morton order of centroids (f32 math matches bvh/ploc.morton_order).
  std::vector<uint64_t> code(n);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t bits[3];
    for (int ax = 0; ax < 3; ++ax) {
      float ext = std::max(smax[ax] - smin[ax], 1e-12f);
      float ctr = 0.5f * (lo[i * 3 + ax] + hi[i * 3 + ax]);
      float u = (ctr - smin[ax]) / ext;
      float q = std::min(std::max(u * 1024.0f, 0.0f), 1023.0f);
      bits[ax] = ploc_expand_bits(static_cast<uint64_t>(q));
    }
    code[i] = (bits[0] << 2) | (bits[1] << 1) | bits[2];
  }
  std::vector<int64_t> mo(n);
  for (int64_t i = 0; i < n; ++i) mo[i] = i;
  std::stable_sort(mo.begin(), mo.end(),
                   [&](int64_t a, int64_t b) { return code[a] < code[b]; });

  // Active-slot state (phase 1: capped agglomeration over singletons).
  // Member lists ride an intrusive linked list over sorted positions.
  std::vector<float> clo(n * 3), chi(n * 3);
  std::vector<int64_t> cnt(n, 1), head(n), tail(n), nxt(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    for (int ax = 0; ax < 3; ++ax) {
      clo[i * 3 + ax] = lo[mo[i] * 3 + ax];
      chi[i * 3 + ax] = hi[mo[i] * 3 + ax];
    }
    head[i] = tail[i] = i;
  }
  std::vector<int64_t> best;
  int64_t m_act = n;
  while (m_act > 1) {
    int64_t merged = ploc_round(
        m_act, window,
        [&](int64_t i, int64_t j) {
          if (cnt[i] + cnt[j] > leaf_size) return INFINITY;
          float u_lo[3], u_hi[3];
          for (int ax = 0; ax < 3; ++ax) {
            u_lo[ax] = std::min(clo[i * 3 + ax], clo[j * 3 + ax]);
            u_hi[ax] = std::max(chi[i * 3 + ax], chi[j * 3 + ax]);
          }
          return ploc_sa(u_lo, u_hi);
        },
        [&](int64_t i, int64_t j) {
          nxt[tail[i]] = head[j];
          tail[i] = tail[j];
          cnt[i] += cnt[j];
          for (int ax = 0; ax < 3; ++ax) {
            clo[i * 3 + ax] = std::min(clo[i * 3 + ax], clo[j * 3 + ax]);
            chi[i * 3 + ax] = std::max(chi[i * 3 + ax], chi[j * 3 + ax]);
          }
          cnt[j] = -1;  // dead marker
        },
        best);
    if (!merged) break;
    int64_t out = 0;
    for (int64_t i = 0; i < m_act; ++i) {
      if (cnt[i] < 0) continue;
      if (out != i) {
        cnt[out] = cnt[i];
        head[out] = head[i];
        tail[out] = tail[i];
        for (int ax = 0; ax < 3; ++ax) {
          clo[out * 3 + ax] = clo[i * 3 + ax];
          chi[out * 3 + ax] = chi[i * 3 + ax];
        }
      }
      ++out;
    }
    m_act = out;
  }

  const int64_t l = m_act;  // leaf count
  // Resolve member lists into the flattened triangle order (leaf-major).
  std::vector<int64_t> leaf_start(l), leaf_cnt(l);
  std::vector<int64_t> ord(n);
  int64_t at = 0;
  for (int64_t i = 0; i < l; ++i) {
    leaf_start[i] = at;
    leaf_cnt[i] = cnt[i];
    for (int64_t node = head[i]; node >= 0; node = nxt[node])
      ord[at++] = mo[node];
  }
  if (at != n) return -1;

  if (l == 1) {
    for (int ax = 0; ax < 3; ++ax) {
      node_min[ax] = clo[ax];
      node_max[ax] = chi[ax];
    }
    node_tri[0] = 0;
    node_ntri[0] = static_cast<int32_t>(n);
    node_skip[0] = 1;
    node_data[0] = -1;
    node_count[0] = -1;
    std::copy(ord.begin(), ord.end(), order);
    return 1;
  }

  // Phase 2: unrestricted PLOC over the leaves to the root, recording
  // topology at creation index (remapped below so the root is node 0).
  // node ids during clustering: leaf k -> (l-1)+k, internal -> creation
  // index (disjoint: creation < l-1).
  std::vector<int64_t> nid(l), left(l - 1), right(l - 1);
  std::vector<float> ilo((l - 1) * 3), ihi((l - 1) * 3);
  for (int64_t i = 0; i < l; ++i) nid[i] = (l - 1) + i;
  std::vector<float> plo(clo.begin(), clo.begin() + l * 3);
  std::vector<float> phi(chi.begin(), chi.begin() + l * 3);
  std::vector<int64_t> alive(l, 1);
  int64_t created = 0;
  m_act = l;
  while (m_act > 1) {
    int64_t merged = ploc_round(
        m_act, window,
        [&](int64_t i, int64_t j) {
          float u_lo[3], u_hi[3];
          for (int ax = 0; ax < 3; ++ax) {
            u_lo[ax] = std::min(plo[i * 3 + ax], plo[j * 3 + ax]);
            u_hi[ax] = std::max(phi[i * 3 + ax], phi[j * 3 + ax]);
          }
          return ploc_sa(u_lo, u_hi);
        },
        [&](int64_t i, int64_t j) {
          left[created] = nid[i];
          right[created] = nid[j];
          for (int ax = 0; ax < 3; ++ax) {
            float a = std::min(plo[i * 3 + ax], plo[j * 3 + ax]);
            float b = std::max(phi[i * 3 + ax], phi[j * 3 + ax]);
            ilo[created * 3 + ax] = a;
            ihi[created * 3 + ax] = b;
            plo[i * 3 + ax] = a;
            phi[i * 3 + ax] = b;
          }
          nid[i] = created++;
          alive[j] = 0;
        },
        best);
    if (!merged) return -1;  // mutual min pair always exists
    int64_t out = 0;
    for (int64_t i = 0; i < m_act; ++i) {
      if (!alive[i]) { alive[i] = 1; continue; }
      if (out != i) {
        nid[out] = nid[i];
        for (int ax = 0; ax < 3; ++ax) {
          plo[out * 3 + ax] = plo[i * 3 + ax];
          phi[out * 3 + ax] = phi[i * 3 + ax];
        }
      }
      ++out;
    }
    m_act = out;
  }

  // Remap creation index c -> internal id (l-2)-c (root = 0); subtree
  // sizes for pre-order skips; then flatten (rt_build_bvh_sah layout).
  auto remap = [&](int64_t x) { return x >= l - 1 ? x : (l - 2) - x; };
  std::vector<int64_t> fl(l - 1), fr(l - 1), sz(l - 1, 0);
  std::vector<float> flo((l - 1) * 3), fhi((l - 1) * 3);
  for (int64_t c = 0; c < l - 1; ++c) {
    int64_t fin = (l - 2) - c;
    fl[fin] = remap(left[c]);
    fr[fin] = remap(right[c]);
    for (int ax = 0; ax < 3; ++ax) {
      flo[fin * 3 + ax] = ilo[c * 3 + ax];
      fhi[fin * 3 + ax] = ihi[c * 3 + ax];
    }
  }
  // Children were created before their parent, so creation order is a
  // valid bottom-up order: fill sizes in decreasing final id.
  auto child_sz = [&](int64_t g) {
    return g >= l - 1 ? int64_t{1} : sz[g];
  };
  for (int64_t fin = l - 2; fin >= 0; --fin)
    sz[fin] = child_sz(fl[fin]) + child_sz(fr[fin]) + 1;

  const int64_t m = 2 * l - 1;
  struct FI {
    int64_t g, skip;
  };
  std::vector<FI> fstack;
  fstack.push_back({0, m});
  int64_t next_node = 0;
  while (!fstack.empty()) {
    FI f = fstack.back();
    fstack.pop_back();
    const int64_t my = next_node++;
    node_skip[my] = static_cast<int32_t>(f.skip);
    if (f.g >= l - 1) {  // leaf
      const int64_t li = f.g - (l - 1);
      for (int ax = 0; ax < 3; ++ax) {
        node_min[my * 3 + ax] = clo[li * 3 + ax];
        node_max[my * 3 + ax] = chi[li * 3 + ax];
      }
      node_tri[my] = static_cast<int32_t>(leaf_start[li]);
      node_ntri[my] = static_cast<int32_t>(leaf_cnt[li]);
      node_data[my] = -static_cast<int32_t>(leaf_start[li] + 1);
      node_count[my] = -1;
    } else {
      for (int ax = 0; ax < 3; ++ax) {
        node_min[my * 3 + ax] = flo[f.g * 3 + ax];
        node_max[my * 3 + ax] = fhi[f.g * 3 + ax];
      }
      const int64_t right_at = my + 1 + child_sz(fl[f.g]);
      node_tri[my] = -1;
      node_ntri[my] = 0;
      node_data[my] = static_cast<int32_t>(my + 1);
      node_count[my] = static_cast<int32_t>(right_at);
      fstack.push_back({fr[f.g], f.skip});
      fstack.push_back({fl[f.g], right_at});
    }
  }
  if (next_node != m) return -1;
  std::copy(ord.begin(), ord.end(), order);
  return m;
}

// ---------------------------------------------------------------------------
// Cluster packing for the packet tracer (FastScene layout): leaves of the
// (leaf_size=8) BVH into [L, 128] rows of 8x16 floats
// (v0, e1=v1-v0, e2=v2-v0, albedo, type, unit geometric normal), using the
// flatten order. Precomputing the Möller–Trumbore edges and the normal at
// pack time removes ~20 scalar ops per triangle from every Pallas leaf
// visit (the kernels' per-visit scalar cost dominates — PERF_NOTES.md).
// verts: [n,3,3] source tris; mats: [n,4]; outputs preallocated.
// ---------------------------------------------------------------------------
void rt_pack_clusters(const float* verts, const float* mats, int64_t n,
                      const int64_t* order, const int32_t* node_tri,
                      const int32_t* node_ntri, int64_t m,
                      int32_t cluster_size, int32_t tri_stride,
                      float* clusters, int32_t* leaf_ids) {
  int32_t li = 0;
  for (int64_t node = 0; node < m; ++node) {
    if (node_tri[node] < 0) {
      leaf_ids[node] = -1;
      continue;
    }
    leaf_ids[node] = li;
    const int64_t start = node_tri[node];
    const int32_t count = node_ntri[node];
    float* row = clusters + static_cast<int64_t>(li) * cluster_size *
                     tri_stride;
    for (int32_t j = 0; j < count; ++j) {
      const int64_t src = order[start + j];
      const float* v = verts + src * 9;
      float* t = row + j * tri_stride;
      float e1[3], e2[3];
      for (int ax = 0; ax < 3; ++ax) {
        t[ax] = v[ax];                    // v0
        e1[ax] = v[3 + ax] - v[ax];
        e2[ax] = v[6 + ax] - v[ax];
        t[3 + ax] = e1[ax];
        t[6 + ax] = e2[ax];
      }
      t[9] = mats[src * 4 + 0];
      t[10] = mats[src * 4 + 1];
      t[11] = mats[src * 4 + 2];
      t[12] = mats[src * 4 + 3];
      // Unit geometric normal. Bit-matches the NumPy packer
      // (builder.pack_tri_records): same op order, division not
      // reciprocal; the Makefile sets -ffp-contract=off so no FMA
      // contraction diverges from NumPy's rounding.
      float nx = e1[1] * e2[2] - e1[2] * e2[1];
      float ny = e1[2] * e2[0] - e1[0] * e2[2];
      float nz = e1[0] * e2[1] - e1[1] * e2[0];
      float len = std::sqrt(nx * nx + ny * ny + nz * nz);
      t[13] = len > 0.0f ? nx / len : 0.0f;
      t[14] = len > 0.0f ? ny / len : 0.0f;
      t[15] = len > 0.0f ? nz / len : 0.0f;
    }
    ++li;
  }
}

}  // extern "C"
