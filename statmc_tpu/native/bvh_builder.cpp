// Native binned-SAH BVH builder with skip-link flattening.
//
// C++ counterpart of accel/bvh.py (same flat-array contract), playing the
// role the reference's C++ BVHAccel build plays (src/accelerators/
// bvh.cpp:203-307: 12-bucket binned SAH).  The Python builder recurses per
// node and is fine up to ~50k triangles; this one is iterative,
// allocation-light, and handles the multi-hundred-k-triangle scenes
// (furball, bathroom) at native speed.  Loaded via ctypes -- no pybind11
// dependency (statmc_tpu/native/__init__.py compiles it on demand).
//
// Contract (matches accel/bvh.py FlatBVH):
//   node_lo/node_hi: [N,3] AABBs
//   node_miss:       [N]   skip-link (-1 terminates traversal)
//   node_leaf_off:   [N]   first primitive-slot index, or -1 internal
//   prim_slots:      [S]   triangle ids, -1 padded, LEAF_SIZE per leaf

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kNBuckets = 12;

struct BuildNode {
  float lo[3], hi[3];
  int left = -1, right = -1;   // child indices in build array
  int prim_begin = -1, prim_count = 0;  // leaf range into prim order
};

struct Builder {
  const float *p0, *e1, *e2;
  int leaf_size;
  std::vector<float> tri_lo, tri_hi, cent;
  std::vector<int> order;  // triangle ids, permuted during build
  std::vector<BuildNode> nodes;

  // Final flat arrays.
  std::vector<float> out_lo, out_hi;
  std::vector<int> out_miss, out_leaf, out_slots;

  void compute_bounds(int n) {
    tri_lo.resize(3 * n);
    tri_hi.resize(3 * n);
    cent.resize(3 * n);
    for (int t = 0; t < n; ++t) {
      for (int a = 0; a < 3; ++a) {
        float v0 = p0[3 * t + a];
        float v1 = v0 + e1[3 * t + a];
        float v2 = v0 + e2[3 * t + a];
        float lo = std::min(v0, std::min(v1, v2));
        float hi = std::max(v0, std::max(v1, v2));
        tri_lo[3 * t + a] = lo;
        tri_hi[3 * t + a] = hi;
        cent[3 * t + a] = 0.5f * (lo + hi);
      }
    }
  }

  static float surface_area(const float lo[3], const float hi[3]) {
    float d0 = std::max(hi[0] - lo[0], 0.f);
    float d1 = std::max(hi[1] - lo[1], 0.f);
    float d2 = std::max(hi[2] - lo[2], 0.f);
    return 2.f * (d0 * d1 + d1 * d2 + d2 * d0);
  }

  int build_range(int begin, int end) {
    int idx = (int)nodes.size();
    nodes.emplace_back();
    BuildNode &node = nodes.back();
    for (int a = 0; a < 3; ++a) {
      node.lo[a] = std::numeric_limits<float>::infinity();
      node.hi[a] = -std::numeric_limits<float>::infinity();
    }
    for (int i = begin; i < end; ++i) {
      int t = order[i];
      for (int a = 0; a < 3; ++a) {
        node.lo[a] = std::min(node.lo[a], tri_lo[3 * t + a]);
        node.hi[a] = std::max(node.hi[a], tri_hi[3 * t + a]);
      }
    }
    int n = end - begin;
    if (n <= leaf_size) {
      node.prim_begin = begin;
      node.prim_count = n;
      return idx;
    }

    // Centroid bounds / widest axis.
    float clo[3], chi[3];
    for (int a = 0; a < 3; ++a) {
      clo[a] = std::numeric_limits<float>::infinity();
      chi[a] = -std::numeric_limits<float>::infinity();
    }
    for (int i = begin; i < end; ++i) {
      int t = order[i];
      for (int a = 0; a < 3; ++a) {
        clo[a] = std::min(clo[a], cent[3 * t + a]);
        chi[a] = std::max(chi[a], cent[3 * t + a]);
      }
    }
    int axis = 0;
    float ext = chi[0] - clo[0];
    for (int a = 1; a < 3; ++a)
      if (chi[a] - clo[a] > ext) { ext = chi[a] - clo[a]; axis = a; }

    int mid;
    if (ext < 1e-12f) {
      mid = begin + n / 2;  // degenerate: median split
      std::nth_element(order.begin() + begin, order.begin() + mid,
                       order.begin() + end, [&](int a_, int b_) {
                         return cent[3 * a_ + axis] < cent[3 * b_ + axis];
                       });
    } else {
      // Binned SAH.
      struct Bucket {
        int count = 0;
        float lo[3], hi[3];
        Bucket() {
          for (int a = 0; a < 3; ++a) {
            lo[a] = std::numeric_limits<float>::infinity();
            hi[a] = -std::numeric_limits<float>::infinity();
          }
        }
      };
      Bucket buckets[kNBuckets];
      auto bucket_of = [&](int t) {
        int b = (int)(kNBuckets * (cent[3 * t + axis] - clo[axis]) / ext);
        return std::min(b, kNBuckets - 1);
      };
      for (int i = begin; i < end; ++i) {
        int t = order[i];
        Bucket &bk = buckets[bucket_of(t)];
        bk.count++;
        for (int a = 0; a < 3; ++a) {
          bk.lo[a] = std::min(bk.lo[a], tri_lo[3 * t + a]);
          bk.hi[a] = std::max(bk.hi[a], tri_hi[3 * t + a]);
        }
      }
      float best_cost = std::numeric_limits<float>::infinity();
      int best_split = -1;
      for (int split = 0; split < kNBuckets - 1; ++split) {
        float llo[3], lhi[3], rlo[3], rhi[3];
        for (int a = 0; a < 3; ++a) {
          llo[a] = rlo[a] = std::numeric_limits<float>::infinity();
          lhi[a] = rhi[a] = -std::numeric_limits<float>::infinity();
        }
        int nl = 0, nr = 0;
        for (int b = 0; b <= split; ++b) {
          nl += buckets[b].count;
          for (int a = 0; a < 3; ++a) {
            llo[a] = std::min(llo[a], buckets[b].lo[a]);
            lhi[a] = std::max(lhi[a], buckets[b].hi[a]);
          }
        }
        for (int b = split + 1; b < kNBuckets; ++b) {
          nr += buckets[b].count;
          for (int a = 0; a < 3; ++a) {
            rlo[a] = std::min(rlo[a], buckets[b].lo[a]);
            rhi[a] = std::max(rhi[a], buckets[b].hi[a]);
          }
        }
        if (nl == 0 || nr == 0) continue;
        float cost = surface_area(llo, lhi) * nl + surface_area(rlo, rhi) * nr;
        if (cost < best_cost) { best_cost = cost; best_split = split; }
      }
      if (best_split < 0) {
        mid = begin + n / 2;
        std::nth_element(order.begin() + begin, order.begin() + mid,
                         order.begin() + end, [&](int a_, int b_) {
                           return cent[3 * a_ + axis] < cent[3 * b_ + axis];
                         });
      } else {
        auto it = std::partition(
            order.begin() + begin, order.begin() + end,
            [&](int t) { return bucket_of(t) <= best_split; });
        mid = (int)(it - order.begin());
      }
    }
    int l = build_range(begin, mid);
    int r = build_range(mid, end);
    nodes[idx].left = l;
    nodes[idx].right = r;
    return idx;
  }

  int subtree_size(int ni) const {
    const BuildNode &nd = nodes[ni];
    if (nd.prim_begin >= 0) return 1;
    return 1 + subtree_size(nd.left) + subtree_size(nd.right);
  }

  void flatten(int ni, int miss) {
    const BuildNode &nd = nodes[ni];
    int idx = (int)out_miss.size();
    for (int a = 0; a < 3; ++a) {
      out_lo.push_back(nd.lo[a]);
      out_hi.push_back(nd.hi[a]);
    }
    out_miss.push_back(miss);
    if (nd.prim_begin >= 0) {
      out_leaf.push_back((int)out_slots.size());
      for (int i = 0; i < leaf_size; ++i)
        out_slots.push_back(i < nd.prim_count ? order[nd.prim_begin + i] : -1);
    } else {
      out_leaf.push_back(-1);
      int right_pos = idx + 1 + subtree_size(nd.left);
      flatten(nd.left, right_pos);
      flatten(nd.right, miss);
    }
  }
};

}  // namespace

extern "C" {

void *statmc_bvh_build(const float *p0, const float *e1, const float *e2,
                       int n_tris, int leaf_size) {
  auto *b = new Builder();
  b->p0 = p0; b->e1 = e1; b->e2 = e2;
  b->leaf_size = leaf_size;
  b->compute_bounds(n_tris);
  b->order.resize(n_tris);
  for (int i = 0; i < n_tris; ++i) b->order[i] = i;
  b->nodes.reserve(2 * n_tris);
  int root = b->build_range(0, n_tris);
  size_t nn = b->nodes.size();
  b->out_lo.reserve(3 * nn);
  b->out_hi.reserve(3 * nn);
  b->out_miss.reserve(nn);
  b->out_leaf.reserve(nn);
  b->flatten(root, -1);
  return b;
}

int statmc_bvh_num_nodes(void *h) {
  return (int)static_cast<Builder *>(h)->out_miss.size();
}

int statmc_bvh_num_slots(void *h) {
  return (int)static_cast<Builder *>(h)->out_slots.size();
}

void statmc_bvh_export(void *h, float *lo, float *hi, int *miss,
                       int *leaf_off, int *slots) {
  auto *b = static_cast<Builder *>(h);
  std::memcpy(lo, b->out_lo.data(), b->out_lo.size() * sizeof(float));
  std::memcpy(hi, b->out_hi.data(), b->out_hi.size() * sizeof(float));
  std::memcpy(miss, b->out_miss.data(), b->out_miss.size() * sizeof(int));
  std::memcpy(leaf_off, b->out_leaf.data(), b->out_leaf.size() * sizeof(int));
  std::memcpy(slots, b->out_slots.data(), b->out_slots.size() * sizeof(int));
}

void statmc_bvh_free(void *h) { delete static_cast<Builder *>(h); }

}  // extern "C"
